"""milvus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of milvus-io/milvus (vector database).

Architecture (Spark-first, NOT a port):
  - Collections are Parquet-backed tables with a StructType schema
    (``milvus_spark.sources.collection``).
  - The Milvus boolean filter language ("expr" strings) compiles to
    ``pyspark.sql.Column`` trees (``milvus_spark.expr``) so Catalyst gets
    full predicate-pushdown / folding / pruning.
  - Vector search is a scan → filter → vectorized scoring (Arrow batches,
    numpy matmul) → partial per-partition top-k → tiny final top-k shuffle
    (``milvus_spark.operators.knn``). IVF acceleration = a centroid table +
    cluster pruning (``milvus_spark.operators.ivf``).
  - BM25 full-text, analyzers, minhash dedup, rerank fusion are column
    pipelines over derived stats tables (``milvus_spark.functions``).
  - DML (insert/upsert/delete/compaction/MVCC) is an append log + tombstone
    table + anti-join reads (``milvus_spark.sources``).
"""

__version__ = "0.1.0"
