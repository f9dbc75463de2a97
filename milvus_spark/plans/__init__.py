"""Plan-building layer: Milvus filter-expression language → pyspark Columns."""
