"""Source connectors: bulk import of JSON / CSV / Parquet / Numpy files."""
