"""Round-11 suite: MINHASH_LSH index lifecycle, grouping search through
the PQ/SQ8/LSH families, and the SPARSE_INVERTED refresh+delete lifecycle
(the r11 epoch-stamp fix). Registered via milvus_spark.registry like every
other suite; oracle SQL uses the same fixtures the queries build."""

from __future__ import annotations
