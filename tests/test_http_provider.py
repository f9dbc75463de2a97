"""HTTP provider plumbing against a local mock server (no external calls).

The mock implements the OpenAI-style /embeddings and a /rerank contract,
computes the SAME deterministic fake model as the stub provider, records
request batch sizes, and injects transient 503s — proving batching, retry,
and stub-equivalence of the wire path end to end."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.embedding import hash_embed_batch
from milvus_spark.operators.http_provider import (
    HttpEmbeddingProvider,
    HttpProviderError,
    HttpRerankProvider,
    http_model_rerank,
    with_http_embedding,
)

_STATE = {"batch_sizes": [], "fail_next": 0, "lock": threading.Lock()}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        with _STATE["lock"]:
            if _STATE["fail_next"] > 0:
                _STATE["fail_next"] -= 1
                self.send_response(503)
                self.end_headers()
                return
        if self.path == "/embeddings":
            texts = body["input"]
            with _STATE["lock"]:
                _STATE["batch_sizes"].append(len(texts))
            vecs = hash_embed_batch(pd.Series(texts), dim=32).tolist()
            out = {"data": [{"embedding": v} for v in vecs]}
        elif self.path == "/rerank":
            q = set(body["query"].lower().split())
            out = {
                "scores": [
                    round(len(q & set(str(d).lower().split())) / max(len(q), 1), 4)
                    for d in body["documents"]
                ]
            }
        elif self.path == "/v1/embeddings":
            # openai shape (openai_client.go:28-76): indexed rows; serve
            # them REVERSED to prove the client restores input order
            texts = body["input"]
            assert body.get("encoding_format") == "float"
            with _STATE["lock"]:
                _STATE["auth"] = self.headers.get("Authorization")
            vecs = hash_embed_batch(pd.Series(texts), dim=32).tolist()
            out = {
                "object": "list",
                "model": body["model"],
                "data": [
                    {"object": "embedding", "index": i, "embedding": v}
                    for i, v in reversed(list(enumerate(vecs)))
                ],
                "usage": {"prompt_tokens": 1, "total_tokens": 1},
            }
        elif self.path == "/embed":
            # tei shape (tei.go:65-72): bare array-of-vectors
            texts = body["inputs"]
            with _STATE["lock"]:
                _STATE["batch_sizes"].append(len(texts))
            out = hash_embed_batch(pd.Series(texts), dim=32).tolist()
        elif self.path == "/v2/embed":
            # cohere shape (cohere_client.go:58-87)
            assert body["embedding_types"] == ["float"]
            vecs = hash_embed_batch(pd.Series(body["texts"]), dim=32).tolist()
            out = {"id": "req-1", "embeddings": {"float": vecs}}
        elif self.path == "/tei_rerank":
            # tei rerank (tei.go:117-122,143-144): indexed items, served
            # sorted by score desc to prove order restoration
            q = set(body["query"].lower().split())
            items = [
                {"index": i, "score": round(len(q & set(str(d).lower().split())) / max(len(q), 1), 4)}
                for i, d in enumerate(body["texts"])
            ]
            out = sorted(items, key=lambda r: -r["score"])
        elif self.path == "/cohere_rerank":
            q = set(body["query"].lower().split())
            out = {
                "id": "req-2",
                "results": sorted(
                    [
                        {"index": i, "relevance_score": round(len(q & set(str(d).lower().split())) / max(len(q), 1), 4)}
                        for i, d in enumerate(body["documents"])
                    ],
                    key=lambda r: -r["relevance_score"],
                ),
            }
        elif self.path == "/badrequest":
            self.send_response(400)
            self.end_headers()
            return
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture(scope="module")
def mock_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_embedding_matches_stub_and_batches(mock_server, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40).repartition(2)
    with _STATE["lock"]:
        _STATE["batch_sizes"].clear()
    prov = HttpEmbeddingProvider(f"{mock_server}/embeddings", model="m", dim=32, batch_size=16)
    got = {r.doc_id: r.embedding for r in with_http_embedding(docs, "text", prov).collect()}

    from milvus_spark.operators.embedding import with_text_embedding

    want = {r.doc_id: r.embedding for r in with_text_embedding(docs, "text", dim=32).collect()}
    assert got == want  # wire path == stub provider, exactly
    with _STATE["lock"]:
        sizes = list(_STATE["batch_sizes"])
    assert sizes and max(sizes) <= 16 and sum(sizes) == 40  # batched, not per-row


def test_http_embedding_retries_transient_503(mock_server, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5).coalesce(1)
    with _STATE["lock"]:
        _STATE["fail_next"] = 2  # two 503s, then success
    prov = HttpEmbeddingProvider(
        f"{mock_server}/embeddings", model="m", dim=32, batch_size=8, backoff=0.01
    )
    out = with_http_embedding(docs, "text", prov).collect()
    assert len(out) == 5 and all(len(r.embedding) == 32 for r in out)


def test_http_embedding_no_retry_on_400(mock_server):
    prov = HttpEmbeddingProvider(f"{mock_server}/badrequest", model="m", dim=32, backoff=0.01)
    with pytest.raises(HttpProviderError, match="HTTP 400"):
        prov.embed(["x"])


def test_http_embedding_exhausts_retries(mock_server):
    with _STATE["lock"]:
        _STATE["fail_next"] = 10  # more than max_retries+1
    prov = HttpEmbeddingProvider(
        f"{mock_server}/embeddings", model="m", dim=32, max_retries=2, backoff=0.01
    )
    with pytest.raises(HttpProviderError, match="after 3 attempts"):
        prov.embed(["x"])
    with _STATE["lock"]:
        _STATE["fail_next"] = 0


def test_http_rerank_reorders_candidates(mock_server, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = (
        docs.select("doc_id", F.col("n_chars").cast("double").alias("orig_score"))
        .orderBy(F.col("orig_score").desc(), F.col("doc_id"))
        .limit(30)
    )
    prov = HttpRerankProvider(f"{mock_server}/rerank", model="r", batch_size=8, backoff=0.01)
    out = http_model_rerank(cand, docs, "doc_id", "text", "spark join agg", prov, limit=10).collect()
    assert len(out) == 10
    scores = [r.rerank_score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0  # the query terms do appear in the corpus


def test_named_embedding_formats_agree(mock_server):
    """openai (indexed, served shuffled), tei (bare array), cohere
    (embeddings.float) all decode to the same vectors as the simple
    contract — and openai's index-restore actually ran (rows came back
    reversed)."""
    texts = [f"doc number {i}" for i in range(7)]
    base = HttpEmbeddingProvider(
        f"{mock_server}/embeddings", model="m", dim=32, backoff=0.01
    ).embed(texts)
    for fmt, path in [("openai", "/v1/embeddings"), ("tei", "/embed"), ("cohere", "/v2/embed")]:
        got = HttpEmbeddingProvider(
            f"{mock_server}{path}", model="m", dim=32, backoff=0.01,
            format=fmt, api_key="sk-test",
        ).embed(texts)
        assert got == base, fmt


def test_openai_format_sends_bearer_auth(mock_server):
    with _STATE["lock"]:
        _STATE["auth"] = None
    HttpEmbeddingProvider(
        f"{mock_server}/v1/embeddings", model="m", dim=32, backoff=0.01,
        format="openai", api_key="sk-test",
    ).embed(["x"])
    with _STATE["lock"]:
        assert _STATE["auth"] == "Bearer sk-test"


def test_embedding_batch_respects_provider_cap(mock_server):
    """The request cap is the provider's documented limit (tei maxBatch 32,
    tei_embedding_provider.go:56) even when the caller asks for more."""
    prov = HttpEmbeddingProvider(
        f"{mock_server}/embed", model="m", dim=32, batch_size=500,
        backoff=0.01, format="tei",
    )
    assert prov.batch_size == 32
    with _STATE["lock"]:
        _STATE["batch_sizes"].clear()
    prov.embed([f"t{i}" for i in range(70)])
    with _STATE["lock"]:
        sizes = list(_STATE["batch_sizes"])
    assert sizes == [32, 32, 6]


def test_named_rerank_formats_restore_order(mock_server):
    """tei/cohere rerank responses arrive sorted by relevance; scores must
    come back in input order regardless."""
    docs = ["spark join", "nothing here", "join agg spark", "agg"]
    want = HttpRerankProvider(
        f"{mock_server}/rerank", model="r", backoff=0.01
    ).score("spark join agg", docs)
    for fmt, path in [("tei", "/tei_rerank"), ("cohere", "/cohere_rerank")]:
        got = HttpRerankProvider(
            f"{mock_server}{path}", model="r", backoff=0.01, format=fmt
        ).score("spark join agg", docs)
        assert got == want, fmt
    assert want[0] > want[1] and want[2] == max(want)


def test_unknown_format_rejected(mock_server):
    with pytest.raises(ValueError, match="unknown provider format"):
        HttpEmbeddingProvider(f"{mock_server}/x", model="m", dim=8, format="nope")
    with pytest.raises(ValueError, match="unknown rerank format"):
        HttpRerankProvider(f"{mock_server}/x", model="m", format="nope")
