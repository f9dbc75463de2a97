"""Ingest function pipelines: text → embedding / BM25 sparse columns at insert.

Reference parity (file:line into /root/reference):
  - FunctionSchema pipelines on a collection (declarative column-producing
    functions run at insert): internal/proxy/function_chain_validator.go;
    BM25 ingest fn internal/util/function/bm25_function.go:103,135,204;
    text-embedding providers internal/util/function/embedding/*_provider.go
    (OpenAI/Vertex/Bedrock/... — network services).

Here the provider call is a pandas UDF slot. Since this container has no
model runtime or network, the default provider is a DETERMINISTIC FAKE —
a seeded hash-projection of token counts into R^dim (stable across runs and
partitions, unit-normalized) — so the Spark-side contract (Arrow batching,
schema, normalization, idempotent re-ingest) is fully real and testable.
A production deployment swaps ``hash_embed_batch`` for a real model call
with identical shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

DIM = 32


def _token_seed_vec(tok: str, dim: int) -> np.ndarray:
    """Deterministic unit-ish vector for a token from its md5 bytes."""
    d = hashlib.md5(tok.encode()).digest()
    rng = np.random.RandomState(int.from_bytes(d[:4], "big"))
    return rng.standard_normal(dim)


def hash_embed_batch(texts: pd.Series, dim: int = DIM) -> pd.Series:
    """Fake 'model': sum of token vectors, L2-normalized, rounded."""
    out = []
    for t in texts:
        toks = [w for w in str(t).lower().split() if w]
        if not toks:
            out.append([0.0] * dim)
            continue
        v = np.sum([_token_seed_vec(w, dim) for w in toks], axis=0)
        n = np.linalg.norm(v)
        out.append(np.round(v / n if n else v, 6).tolist())
    return pd.Series(out)


MD5_DIM = 16


def md5_embed_batch(texts: pd.Series, dim: int = MD5_DIM) -> pd.Series:
    """SQL-reproducible fake 'model': component j is the j-th byte of
    md5(text) centered at 127.5, then L2-normalized. Pure integer-derived
    arithmetic in a fixed order, so an external SQL engine (hex-pair parse
    of md5) recomputes the identical vector — this provider backs the
    oracle-checked ingest query while ``hash_embed_batch`` keeps the
    token-aware semantics for similarity tests."""
    import math

    if dim > MD5_DIM:
        raise ValueError(
            f"md5_embed_batch supports dim <= {MD5_DIM} (one hex pair per "
            f"component); got dim={dim}"
        )
    out = []
    for t in texts:
        h = hashlib.md5(str(t).encode()).hexdigest()
        c = [int(h[2 * j : 2 * j + 2], 16) - 127.5 for j in range(dim)]
        sumsq = 0.0
        for x in c:  # strict left-to-right fold — matches the oracle's sum
            sumsq += x * x
        n = math.sqrt(sumsq)
        out.append([x / n for x in c])
    return pd.Series(out)


def with_text_embedding(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    dim: int = DIM,
    provider=None,
) -> DataFrame:
    """Append an embedding column via the provider pandas UDF (Arrow-batched)."""
    fn = provider or hash_embed_batch

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(s: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in s:
            yield fn(batch, dim)

    return df.withColumn(out_col, embed(F.col(text_col)))
