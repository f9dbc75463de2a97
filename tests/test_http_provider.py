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
