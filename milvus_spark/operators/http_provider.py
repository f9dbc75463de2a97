"""HTTP model providers: embedding + rerank calls with batching and retry.

Reference parity (file:line into /root/reference):
  - text-embedding providers internal/util/function/embedding/*_provider.go
    (OpenAI/Vertex/Bedrock/SiliconFlow/... all share: batch the inputs, POST
    JSON, parse per-input vectors, retry transient failures).
  - rerank providers internal/util/function/rerank/*_provider.go (query +
    candidate documents → per-document scores).

Spark shape: the provider object is pickled to executors and called from an
Arrow-batched pandas UDF — one HTTP round-trip per ``batch_size`` inputs,
never per row. Retries are per-chunk with exponential backoff so a 429/5xx
on one chunk doesn't re-send the whole partition. stdlib urllib only (no
extra packages); tests run against a local mock server — the deterministic
stub provider (operators/embedding.py) remains the oracle path.

Scale: one Arrow batch (~10k rows) per UDF call → ceil(10k/batch_size)
sequential POSTs per task; parallelism comes from Spark tasks, matching how
the reference fans provider calls across segments.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

RETRYABLE = {429, 500, 502, 503, 504}


class HttpProviderError(RuntimeError):
    pass


class _HttpJsonClient:
    """POST JSON with bounded retries + exponential backoff."""

    def __init__(self, url: str, headers: dict | None = None, timeout: float = 30.0,
                 max_retries: int = 3, backoff: float = 0.2):
        self.url = url
        self.headers = {"Content-Type": "application/json", **(headers or {})}
        self.timeout = timeout
        self.max_retries = int(max_retries)
        self.backoff = backoff

    def post(self, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(self.url, data=body, headers=self.headers)
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode())
            except urllib.error.HTTPError as e:
                last = e
                if e.code not in RETRYABLE:
                    raise HttpProviderError(f"provider HTTP {e.code}: {e.reason}") from e
            except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
                last = e
            if attempt < self.max_retries:
                time.sleep(self.backoff * (2 ** attempt))
        raise HttpProviderError(f"provider failed after {self.max_retries + 1} attempts: {last}")


class HttpEmbeddingProvider:
    """OpenAI-style /embeddings contract: {model, input: [texts]} →
    {data: [{embedding: [...]}, ...]} in input order."""

    def __init__(self, url: str, model: str, dim: int, batch_size: int = 64,
                 headers: dict | None = None, timeout: float = 30.0,
                 max_retries: int = 3, backoff: float = 0.2):
        self.client = _HttpJsonClient(url, headers, timeout, max_retries, backoff)
        self.model = model
        self.dim = int(dim)
        self.batch_size = int(batch_size)

    def embed(self, texts: Sequence[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = [str(t) for t in texts[i : i + self.batch_size]]
            data = self.client.post({"model": self.model, "input": chunk}).get("data", [])
            if len(data) != len(chunk):
                raise HttpProviderError(f"provider returned {len(data)} vectors for {len(chunk)} inputs")
            for row in data:
                v = row["embedding"]
                if len(v) != self.dim:
                    raise HttpProviderError(f"provider dim {len(v)} != schema dim {self.dim}")
                out.append([float(x) for x in v])
        return out


class HttpRerankProvider:
    """Rerank contract: {model, query, documents: [...]} → {scores: [...]}."""

    def __init__(self, url: str, model: str, batch_size: int = 32,
                 headers: dict | None = None, timeout: float = 30.0,
                 max_retries: int = 3, backoff: float = 0.2):
        self.client = _HttpJsonClient(url, headers, timeout, max_retries, backoff)
        self.model = model
        self.batch_size = int(batch_size)

    def score(self, query: str, docs: Sequence[str]) -> list[float]:
        out: list[float] = []
        for i in range(0, len(docs), self.batch_size):
            chunk = [str(d) for d in docs[i : i + self.batch_size]]
            scores = self.client.post(
                {"model": self.model, "query": str(query), "documents": chunk}
            ).get("scores", [])
            if len(scores) != len(chunk):
                raise HttpProviderError(f"provider returned {len(scores)} scores for {len(chunk)} docs")
            out.extend(float(s) for s in scores)
        return out


def with_http_embedding(df: DataFrame, text_col: str, provider: HttpEmbeddingProvider,
                        out_col: str = "embedding") -> DataFrame:
    """Append provider embeddings via an Arrow-batched pandas UDF — the
    FunctionSchema ingest hook with a real network provider plugged in
    (same signature as embedding.with_text_embedding's stub path)."""
    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield pd.Series(provider.embed(batch.tolist()))

    return df.withColumn(out_col, embed(F.col(text_col)))


def http_model_rerank(cand: DataFrame, corpus: DataFrame, pk_col: str, text_col: str,
                      query: str, provider: HttpRerankProvider, limit: int = 10) -> DataFrame:
    """Rerank a candidate top-k through the HTTP scorer: re-fetch text by pk
    (broadcast candidate join — never rescans the corpus), score in Arrow
    batches, re-sort. Mirrors operators/hybrid.model_rerank's plan with the
    provider slot swapped from the deterministic stub to the network call."""
    @F.pandas_udf(DoubleType())
    def rescore(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield pd.Series(provider.score(query, batch.tolist()))

    if "orig_score" not in cand.columns and "score" in cand.columns:
        cand = cand.withColumnRenamed("score", "orig_score")  # accept raw hit frames
    with_text = corpus.select(pk_col, text_col).join(F.broadcast(cand), pk_col)
    scored = with_text.withColumn("rerank_score", rescore(F.col(text_col))).drop(text_col)
    return (
        scored.orderBy(F.col("rerank_score").desc(), F.col("orig_score").desc(), F.col(pk_col))
        .limit(limit)
    )
