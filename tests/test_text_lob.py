"""TEXT-LOB behaviors (test_milvus_client_text_lob.py:821-1020): large text
payloads share a schema with ordinary varchars and stay first-class for
text_match / dense-search output fetch / iterator pagination.

Spark-first storage note: the reference stores TEXT out-of-line in a LOB
tier with pointer fetch; parquet's columnar layout IS that tier here — the
LOB column's pages are only read when a projection asks for them (column
pruning), which the plan test below pins via ReadSchema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.client import MilvusSparkClient

LOB = "lorem merge spark token " * 16_000  # ~384 KB per row


@pytest.fixture()
def client(spark, tmp_path):
    c = MilvusSparkClient(spark, root=str(tmp_path / "lob_root"))
    rows = [
        (i, f"tag{i}", LOB + f" marker{i}" + (" needle" if i % 3 == 0 else ""))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "pk long, tag string, body string")
    c.create_collection("lob", pk_field="pk", vector_field=None)
    c.insert("lob", df)
    return c


def test_lob_payload_roundtrip(client):
    got = client.query("lob", filter="pk == 7", output_fields=["pk", "body"]).first()
    assert got.body.startswith("lorem merge spark") and got.body.endswith("marker7")
    assert len(got.body) > 300_000


def test_text_match_over_lob(client):
    # text_match works on the LOB column exactly as on a short varchar
    n = client.query("lob", filter='text_match(body, "needle")').count()
    assert n == 4  # pk 0,3,6,9
    # minimum_should_match over LOB + varchar equality in one filter
    n = client.query(
        "lob", filter='text_match(body, "needle marker3", 2) and tag == "tag3"'
    ).count()
    assert n == 1


def test_query_iterator_lob_payloads(client):
    seen = {}
    for page in client.query_iterator("lob", batch_size=5):
        for r in page:  # pages are row lists, like the reference iterator
            seen[r["pk"]] = len(r["body"])
    assert len(seen) == 12 and all(v > 300_000 for v in seen.values())


def test_lob_column_pruned_unless_projected(client, spark):
    # the LOB tier is pay-per-projection: a query that does not ask for the
    # body must not read its pages (ReadSchema excludes it at the scan)
    df = client.query("lob", filter="pk < 5", output_fields=["pk", "tag"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("body" not in ln for ln in read_schema)
