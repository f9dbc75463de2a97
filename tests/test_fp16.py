"""fp16/bf16 storage: the JVM bit-arithmetic decode must equal numpy's
float16 semantics exactly (Types.h:92-99 store-narrow/compute-wide)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from milvus_spark.operators.fp16 import bf16_to_f32, encode_fp16, fp16_to_f32


def test_fp16_roundtrip_exact(spark):
    rng = np.random.default_rng(3)
    V = rng.standard_normal((50, 8)).astype(np.float32)
    V[0, :4] = [0.0, 1e-5, -1e-5, 65000.0]  # subnormals + big magnitude
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(V)], "vec_id long, embedding array<float>"
    )
    enc = encode_fp16(df, "embedding", "vec_id")
    dec = enc.select("vec_id", fp16_to_f32(F.col("emb16"), 8).alias("emb")).collect()
    got = {r.vec_id: np.asarray(r.emb) for r in dec}
    want = V.astype(np.float16).astype(np.float64)
    for i in range(len(V)):
        assert np.array_equal(got[i], want[i]), (i, got[i], want[i])


def test_bf16_bits_decode(spark):
    vals = np.array([0.5, -1.25, 3.1415927, 1e-3, -65504.0], dtype=np.float32)
    bits = (vals.view(np.uint32) >> 16).astype(np.int64)  # truncation-mode bf16
    df = spark.createDataFrame([(int(b),) for b in bits], "h long")
    got = np.array([r.v for r in df.select(bf16_to_f32(F.col("h")).alias("v")).collect()])
    want = (bits.astype(np.uint32) << 16).view(np.float32).astype(np.float64)
    assert np.array_equal(got, want)
