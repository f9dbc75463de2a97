"""Collection-level namespaces (multi-tenancy) — both modes.

Reference contracts (file:line into /root/reference):
  - hidden field + plan merge: $namespace_id (pkg/common/common.go:61-67),
    MergeExprWithNamespace (internal/core/src/query/PlanProto.cpp:70-86)
  - strict enable/namespace agreement both ways: CheckNamespace
    (pkg/common/common.go:957-968)
  - partition mode: namespace ↔ partition name resolution + mismatch errors
    (internal/proxy/util.go:2844-2874)
  - insert stamping / validation of caller-supplied namespace data:
    addNamespaceData (internal/proxy/util.go:2871-2900)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.client import MilvusSparkClient


def mkdf(spark, n=30):
    return spark.createDataFrame(
        [(i, f"u{i % 5}", float(i)) for i in range(n)], "id long, user string, val double"
    )


@pytest.fixture()
def cli(spark, tmp_path):
    return MilvusSparkClient(spark, root=str(tmp_path))


def test_namespace_field_mode(spark, cli):
    cli.create_collection("nsf", "id")
    # strict: namespace on a disabled collection is an error
    with pytest.raises(ValueError, match="namespace disabled"):
        cli.insert("nsf", mkdf(spark), namespace="a")

    cli.create_collection("ns1", "id", enable_namespace=True)
    df = mkdf(spark)
    cli.insert("ns1", df.filter(F.col("id") % 3 == 0), namespace="t0")
    cli.insert("ns1", df.filter(F.col("id") % 3 == 1), namespace="t1")
    cli.insert("ns1", df.filter(F.col("id") % 3 == 2), namespace="t2")

    # strict: enabled collection requires a namespace on every query
    with pytest.raises(ValueError, match="namespace enabled"):
        cli.query("ns1", filter="val >= 0")

    got = sorted(r.id for r in cli.query("ns1", filter="val >= 0", namespace="t1").collect())
    assert got == [i for i in range(30) if i % 3 == 1]
    # user filter composes with the namespace conjunct
    got = sorted(
        r.id
        for r in cli.query("ns1", filter='user == "u1"', namespace="t1").collect()
    )
    assert got == [i for i in range(30) if i % 3 == 1 and i % 5 == 1]


def test_namespace_field_mode_search_and_delete(spark, cli):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "id long, emb array<float>"
    )
    cli.create_collection("ns2", "id", vector_field="emb", metric_type="L2",
                          enable_namespace=True)
    cli.insert("ns2", emb.filter(F.col("id") % 2 == 0), namespace="even")
    cli.insert("ns2", emb.filter(F.col("id") % 2 == 1), namespace="odd")

    hits = cli.search("ns2", [[5.0, 1.0]], limit=3, namespace="odd").collect()
    assert [r.id for r in sorted(hits, key=lambda r: r.rank)] == [5, 3, 7]
    with pytest.raises(ValueError, match="namespace enabled"):
        cli.search("ns2", [[5.0, 1.0]], limit=3)

    # delete by ids is tenancy-scoped: deleting 5 (odd) from "even" is a no-op
    cli.delete("ns2", ids=[5], namespace="even")
    assert cli.query("ns2", filter="id == 5", namespace="odd").count() == 1
    cli.delete("ns2", ids=[5], namespace="odd")
    assert cli.query("ns2", filter="id == 5", namespace="odd").count() == 0


def test_namespace_insert_validation(spark, cli):
    cli.create_collection("ns3", "id", enable_namespace=True)
    pre = mkdf(spark, 5).withColumn("$namespace_id", F.lit("t0"))
    cli.insert("ns3", pre, namespace="t0")  # matching pre-stamped column OK
    assert cli.query("ns3", filter="val >= 0", namespace="t0").count() == 5
    # mismatching pre-stamped column fails loudly at write time
    bad = mkdf(spark, 5).withColumn("$namespace_id", F.lit("t9"))
    with pytest.raises(Exception, match="mismatches namespace"):
        cli.insert("ns3", bad, namespace="t0")
    with pytest.raises(ValueError, match="invalid namespace"):
        cli.insert("ns3", mkdf(spark, 2), namespace='x"; drop')


def test_namespace_partition_mode(spark, cli):
    cli.create_collection(
        "nsp", "id", enable_namespace=True,
        properties={"namespace.mode": "partition"},
    )
    df = mkdf(spark)
    cli.insert("nsp", df.filter(F.col("id") < 15), namespace="alpha")
    cli.insert("nsp", df.filter(F.col("id") >= 15), namespace="beta")
    got = sorted(r.id for r in cli.query("nsp", filter="val >= 0", namespace="beta").collect())
    assert got == list(range(15, 30))
    # explicit partition names must agree with the namespace
    with pytest.raises(ValueError, match="mismatch"):
        cli.query("nsp", filter="val >= 0", namespace="beta", partition_names=["alpha"])
    with pytest.raises(ValueError, match="mismatches"):
        cli.insert("nsp", df.limit(1), namespace="beta", partition_name="alpha")


def test_namespace_field_mode_prunes_directories(spark, cli):
    """Field mode doubles $namespace_id as the physical partition key, so a
    tenant read prunes to its own directory (PartitionFilters in the scan) —
    per-tenant cost at any corpus size."""
    cli.create_collection("ns4", "id", enable_namespace=True)
    df = mkdf(spark)
    cli.insert("ns4", df.filter(F.col("id") < 15), namespace="a")
    cli.insert("ns4", df.filter(F.col("id") >= 15), namespace="b")
    q = cli.query("ns4", filter="val >= 0", namespace="a")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "namespace_id" in plan.split("PartitionFilters", 1)[1][:400]


def test_namespace_column_hidden_in_query(spark, cli):
    cli.create_collection("nsh", "id", enable_namespace=True)
    cli.insert("nsh", mkdf(spark, 4), namespace="t")
    rows = cli.query("nsh", filter="val >= 0", namespace="t").collect()
    assert rows and all("$namespace_id" not in r.asDict() for r in rows)
    rows = cli.query(
        "nsh", filter="val >= 0", namespace="t",
        output_fields=["id", "$namespace_id"],
    ).collect()
    assert all(r["$namespace_id"] == "t" for r in rows)


def test_namespace_search_prunes_directories(spark, cli):
    """The merged namespace conjunct reaches the parquet scan in SEARCH too:
    the brute-force kernel's input scan carries PartitionFilters on
    $namespace_id, so a tenant ANN query reads only its own directory."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "id long, emb array<float>"
    )
    cli.create_collection("nspr", "id", vector_field="emb", metric_type="L2",
                          enable_namespace=True)
    cli.insert("nspr", emb.filter(F.col("id") < 5), namespace="a")
    cli.insert("nspr", emb.filter(F.col("id") >= 5), namespace="b")
    hits = cli.search("nspr", [[2.0, 1.0]], limit=2, namespace="a")
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    idx = plan.index("PartitionFilters")
    assert "namespace_id" in plan[idx:idx + 400]
    assert [r.id for r in sorted(hits.collect(), key=lambda r: r.rank)] == [2, 1]


def test_namespace_requery_and_upsert_scoped(spark, cli):
    """Regression bundle: (1) output-field requery must not leak another
    tenant's row for a shared pk; (2) upsert enforces the strict namespace
    check and keeps the tenant stamp; (3) get/count/text_search are
    namespace-scoped."""
    cli.create_collection("nsr", "id", vector_field="emb", metric_type="L2",
                          enable_namespace=True)
    mk = lambda val: spark.createDataFrame(
        [(1, val, [1.0, 0.0])], "id long, val string, emb array<float>"
    )
    cli.insert("nsr", mk("secret-A"), namespace="ta")
    cli.insert("nsr", mk("secret-B"), namespace="tb")
    hits = cli.search(
        "nsr", [[1.0, 0.0]], limit=3, namespace="ta", output_fields=["val"]
    ).collect()
    assert [r.val for r in hits] == ["secret-A"]  # exactly one row, own tenant
    # get/count are scoped and strict
    with pytest.raises(ValueError, match="namespace enabled"):
        cli.count("nsr")
    assert cli.count("nsr", namespace="tb") == 1
    assert [r.val for r in cli.get("nsr", [1], output_fields=["val"],
                                   namespace="tb").collect()] == ["secret-B"]
    # strict check + stamp on upsert; upsert matches the pk GLOBALLY (the
    # collection pk contract), so the shared pk collapses to ta's new row
    with pytest.raises(ValueError, match="namespace enabled"):
        cli.upsert("nsr", mk("x"))
    cli.upsert("nsr", mk("updated-A"), namespace="ta")
    got = cli.query("nsr", filter="id == 1", namespace="ta",
                    output_fields=["val"]).collect()
    assert [r.val for r in got] == ["updated-A"]
    assert cli.count("nsr", namespace="tb") == 0


def test_order_by_respects_as_of_and_dynamic_numbers(spark, cli):
    """Regression: order_by_fields joins order values inside the SAME
    visibility scope as the hits (as-of snapshot), and dynamic ($meta)
    numeric values order numerically, not lexicographically."""
    cli.create_collection(
        "oad", "id", vector_field="emb", metric_type="L2",
        enable_dynamic_field=True, fields=["id", "emb"],
    )
    df = spark.createDataFrame(
        [(1, [1.0], 2.0), (2, [2.0], 10.0), (3, [3.0], 9.0)],
        "id long, emb array<float>, price double",
    )
    cli.insert("oad", df)
    ts = cli.get_collection_stats("oad")["max_ts"] if False else None
    # dynamic numeric ordering: price lives in $meta
    got = cli.search(
        "oad", [[0.0]], limit=3,
        order_by_fields=[{"field": "price", "order": "asc"}],
        output_fields=["price"],
    ).collect()
    vals = [float(r.price) for r in sorted(got, key=lambda r: r.rank)]
    assert vals == [2.0, 9.0, 10.0]  # '10' < '2' lexicographically — must not
