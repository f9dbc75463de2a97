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


# Named wire formats — request/response schemas + default batch caps mirror
# the reference's per-provider clients (all shapes are the providers' PUBLIC
# HTTP APIs; file:line cites are where the reference binds them):
#   openai: {model, input:[...]} → {object:"list", data:[{index, embedding}],
#           model, usage}; maxBatch 128; Bearer auth
#           (models/openai/openai_client.go:28-76,
#           embedding/openai_embedding_provider.go:134). Also the shape
#           vLLM/SiliconFlow-compatible servers speak.
#   tei:    {inputs:[...], truncate?} → bare [[...], ...]; maxBatch 32
#           (models/tei/tei.go:65-72, embedding/tei_embedding_provider.go:56)
#   cohere: {model, texts:[...], input_type?, embedding_types:["float"]}
#           → {id, embeddings:{float:[[...]]}}
#           (models/cohere/cohere_client.go:58-87)
# "simple" keeps this module's original minimal contract for local stubs.
EMBED_FORMATS = ("openai", "tei", "cohere", "simple")
_EMBED_MAX_BATCH = {"openai": 128, "tei": 32, "cohere": 96, "simple": 64}


def _build_embed_request(fmt: str, model: str, chunk: list[str]) -> dict:
    if fmt == "openai":
        return {"model": model, "input": chunk, "encoding_format": "float"}
    if fmt == "tei":
        return {"inputs": chunk, "truncate": True}
    if fmt == "cohere":
        return {
            "model": model,
            "texts": chunk,
            "input_type": "search_document",
            "embedding_types": ["float"],
        }
    return {"model": model, "input": chunk}


def _parse_embed_response(fmt: str, resp, n: int) -> list[list[float]]:
    if fmt == "tei":
        data = resp  # bare array-of-vectors (tei.go:72)
    elif fmt == "cohere":
        data = (resp.get("embeddings") or {}).get("float") or []
    else:  # openai / simple: data rows carry {index?, embedding}
        rows = resp.get("data", [])
        if rows and "index" in rows[0]:
            rows = sorted(rows, key=lambda r: r["index"])
        data = [r["embedding"] for r in rows]
    if len(data) != n:
        raise HttpProviderError(
            f"provider returned {len(data)} vectors for {n} inputs"
        )
    return data


class HttpEmbeddingProvider:
    """Text-embedding provider speaking a named public wire format
    (``format``: openai | tei | cohere | simple). Batching honors the
    provider's documented request cap; responses are order-restored (openai
    rows re-sorted by index) and dim-validated before anything reaches a
    vector column."""

    def __init__(self, url: str, model: str, dim: int, batch_size: int | None = None,
                 headers: dict | None = None, timeout: float = 30.0,
                 max_retries: int = 3, backoff: float = 0.2,
                 format: str = "simple", api_key: str | None = None):
        if format not in EMBED_FORMATS:
            raise ValueError(f"unknown provider format {format!r}; have {EMBED_FORMATS}")
        headers = dict(headers or {})
        if api_key:
            # openai/tei use Bearer; cohere accepts Bearer on its v2 API
            headers.setdefault("Authorization", f"Bearer {api_key}")
        self.client = _HttpJsonClient(url, headers, timeout, max_retries, backoff)
        self.model = model
        self.dim = int(dim)
        self.format = format
        cap = _EMBED_MAX_BATCH[format]
        self.batch_size = min(int(batch_size), cap) if batch_size else cap

    def embed(self, texts: Sequence[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = [str(t) for t in texts[i : i + self.batch_size]]
            resp = self.client.post(_build_embed_request(self.format, self.model, chunk))
            for v in _parse_embed_response(self.format, resp, len(chunk)):
                if len(v) != self.dim:
                    raise HttpProviderError(f"provider dim {len(v)} != schema dim {self.dim}")
                out.append([float(x) for x in v])
        return out


# Rerank wire formats (rerank/*_provider.go):
#   tei:    {query, texts:[...]} → [{index, score}] (models/tei/tei.go:117-122,143-144)
#   cohere: {model, query, documents:[...]} → {results:[{index,
#           relevance_score}]} (models/cohere/cohere_client.go:150-169,186-187)
#   simple: {model, query, documents} → {scores:[...]} (local stubs)
RERANK_FORMATS = ("tei", "cohere", "simple")


def _build_rerank_request(fmt: str, model: str, query: str, chunk: list[str]) -> dict:
    if fmt == "tei":
        return {"query": query, "texts": chunk, "raw_scores": False}
    if fmt == "cohere":
        return {"model": model, "query": query, "documents": chunk}
    return {"model": model, "query": query, "documents": chunk}


def _parse_rerank_response(fmt: str, resp, n: int) -> list[float]:
    if fmt == "tei":
        items = {int(r["index"]): float(r["score"]) for r in resp}
    elif fmt == "cohere":
        items = {
            int(r["index"]): float(r["relevance_score"])
            for r in resp.get("results", [])
        }
    else:
        scores = resp.get("scores", [])
        if len(scores) != n:
            raise HttpProviderError(f"provider returned {len(scores)} scores for {n} docs")
        return [float(s) for s in scores]
    if len(items) != n or set(items) != set(range(n)):
        raise HttpProviderError(
            f"provider returned indices {sorted(items)} for {n} docs"
        )
    return [items[i] for i in range(n)]


class HttpRerankProvider:
    """Query+documents → per-document scores, speaking a named public wire
    format (``format``: tei | cohere | simple). Index-addressed responses
    are restored to input order — a provider returning results sorted by
    relevance must not silently permute candidate scores."""

    def __init__(self, url: str, model: str, batch_size: int = 32,
                 headers: dict | None = None, timeout: float = 30.0,
                 max_retries: int = 3, backoff: float = 0.2,
                 format: str = "simple", api_key: str | None = None):
        if format not in RERANK_FORMATS:
            raise ValueError(f"unknown rerank format {format!r}; have {RERANK_FORMATS}")
        headers = dict(headers or {})
        if api_key:
            headers.setdefault("Authorization", f"Bearer {api_key}")
        self.client = _HttpJsonClient(url, headers, timeout, max_retries, backoff)
        self.model = model
        self.format = format
        self.batch_size = int(batch_size)

    def score(self, query: str, docs: Sequence[str]) -> list[float]:
        out: list[float] = []
        for i in range(0, len(docs), self.batch_size):
            chunk = [str(d) for d in docs[i : i + self.batch_size]]
            resp = self.client.post(
                _build_rerank_request(self.format, self.model, str(query), chunk)
            )
            out.extend(_parse_rerank_response(self.format, resp, len(chunk)))
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
