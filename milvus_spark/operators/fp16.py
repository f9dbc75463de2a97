"""FLOAT16 vector storage: raw IEEE-754 half bits, decoded to fp32 on read.

Reference parity: Float16Vector / BFloat16Vector (Types.h:92-99) are stored
as 2-byte-per-element buffers and widened to fp32 for distance compute
(knowhere casts half inputs up before scoring). Spark has no HalfFloatType
and rejects parquet FLOAT16 (PARQUET_TYPE_ILLEGAL), so the Spark-native
layout is the same one the reference uses: a BINARY column holding packed
little-endian half bits — true 2N-byte storage (half the fp32 scan I/O) —
with the fp32 widening done by pure JVM bit-arithmetic expressions at scan
time (no Python on the read path). DuckDB decodes the identical bytes with
the identical formula, so fp16-stored search is exact-oracle-checkable.

The same layout carries BFLOAT16: bf16 bits are the high 16 of fp32, so
``bf16_to_f32`` is a single shift — included for the Types.h pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_fp16(df: DataFrame, vec_col: str, pk_col: str) -> DataFrame:
    """fp32 → packed fp16 bytes (numpy round-to-nearest-even), Arrow-batched."""
    import numpy as np

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float32) for v in pdf[vec_col]], dtype=np.float32
            ).astype(np.float16)
            yield pd.DataFrame(
                {pk_col: pdf[pk_col].to_numpy(), "emb16": [r.tobytes() for r in V]}
            )

    return df.select(pk_col, vec_col).mapInPandas(enc, schema=f"{pk_col} long, emb16 binary")


def _half_bits_to_f32(h: Column) -> Column:
    """IEEE 754 binary16 → double, from the 16-bit pattern as an int Column.

    exp==0 → subnormal m·2⁻²⁴; else (1024+m)·2^(e−25); exp==31 (inf/nan)
    never occurs for real embedding payloads and decodes as a large finite —
    callers with adversarial data should pre-filter."""
    sign = F.when(h >= 32768, F.lit(-1.0)).otherwise(F.lit(1.0))
    e = F.shiftright(h, 10).bitwiseAND(F.lit(31))
    m = h.bitwiseAND(F.lit(1023))
    mag = F.when(e == 0, m.cast("double") * F.lit(2.0 ** -24)).otherwise(
        (m + F.lit(1024)).cast("double") * F.pow(F.lit(2.0), (e - 25).cast("double"))
    )
    return sign * mag


def fp16_to_f32(bin_col: Column, dim: int) -> Column:
    """Decode a packed-fp16 BINARY column to array<double>, JVM-side.

    The hex string is materialized ONCE per row via a lambda binding
    (transform over a single-element array) — referencing ``hex(bin)``
    inside the per-element lambda would re-hex the whole 2·dim-byte
    buffer for every element (O(dim²) work per row)."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def decode_all(hx: Column) -> Column:
        def elem(i: Column) -> Column:
            # little-endian pair: swap the two hex bytes before parsing
            word = F.concat(
                hx.substr(i * 4 + 3, F.lit(2)), hx.substr(i * 4 + 1, F.lit(2))
            )
            return _half_bits_to_f32(F.conv(word, 16, 10).cast("int"))

        return F.transform(idx, elem)

    # bind hex(bin) to a lambda variable so it's evaluated once per row
    return F.element_at(
        F.transform(F.array(F.hex(bin_col)), decode_all), 1
    )


def bf16_to_f32(h: Column) -> Column:
    """bfloat16 bits (int Column) → double: bf16 is fp32's top half."""
    sign = F.when(h >= 32768, F.lit(-1.0)).otherwise(F.lit(1.0))
    e = F.shiftright(h, 7).bitwiseAND(F.lit(255))
    m = h.bitwiseAND(F.lit(127))
    mag = F.when(e == 0, m.cast("double") * F.pow(F.lit(2.0), F.lit(-133.0))).otherwise(
        (m + F.lit(128)).cast("double") * F.pow(F.lit(2.0), (e - 134).cast("double"))
    )
    return sign * mag


def fp16_decode_sql(col: str, dim: int) -> str:
    """DuckDB twin of fp16_to_f32 over the same BINARY column — identical
    bit arithmetic, so both engines surface identical doubles."""
    h = (
        f"(('0x' || substr(hex({col}), i*4+3, 2) || substr(hex({col}), i*4+1, 2))::INTEGER)"
    )
    val = (
        f"(CASE WHEN {h} >= 32768 THEN -1.0 ELSE 1.0 END) * "
        f"(CASE WHEN ({h} // 1024) % 32 = 0 THEN ({h} % 1024) * pow(2.0, -24) "
        f"ELSE (1024 + ({h} % 1024)) * pow(2.0, (({h} // 1024) % 32) - 25) END)"
    )
    return f"list_transform(range(0, {dim}), i -> {val})"
