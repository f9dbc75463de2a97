"""Salted skew tools must be result-identical to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from milvus_spark.operators.skew import salted_distinct_count, salted_join
from milvus_spark.session import load_table


def test_salted_distinct_count_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = {
        (r["event_type"], r["n_distinct"])
        for r in salted_distinct_count(e, "event_type", "user_id", 16).collect()
    }
    want = {
        (r["event_type"], r["n"])
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    got = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(o, c, "o_custkey", buckets=4).collect()
    )
    want = sorted(
        (r["o_orderkey"], r["c_name"]) for r in o.join(c, "o_custkey").collect()
    )
    assert got == want
