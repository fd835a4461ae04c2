"""Decimal precision pins (SURVEY §7 risk 4).

The reference serializes dark-pool decimals as strings to dodge
float loss (/root/reference/darkpool_trades/main.py:27-33); we keep
DecimalType internally and cast to string only at the sink boundary.
These tests pin that the round-trip is lossless and that decimal
math stays exact where float64 would drift.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def test_decimal_string_roundtrip_lossless(spark):
    vals = [
        (Decimal("123456789012.123456"),),
        (Decimal("0.000001"),),
        (Decimal("-999999.999999"),),
        (Decimal("0.1"),),
    ]
    df = spark.createDataFrame(vals, "d decimal(18,6)")
    back = df.select(
        F.col("d"),
        F.col("d").cast("string").cast("decimal(18,6)").alias("rt"),
    ).collect()
    for r in back:
        assert r.d == r.rt, (r.d, r.rt)


def test_decimal_value_math_exact(spark):
    """price x qty at decimal precision: 0.1 x 3 is exactly 0.3 in
    DecimalType; the float64 path would give 0.30000000000000004."""
    df = spark.createDataFrame(
        [(Decimal("0.100000"), 3)], "price decimal(18,6), qty int"
    )
    row = df.select(
        (F.col("price") * F.col("qty")).alias("value"),
        (F.col("price").cast("double") * F.col("qty")).alias("value_f64"),
    ).collect()[0]
    assert row.value == Decimal("0.3")
    assert float(row.value_f64) != 0.3 or abs(row.value_f64 - 0.3) < 1e-15
    # The string sink form is canonical (no exponent, no noise).
    s = df.select((F.col("price") * F.col("qty")).cast("string").alias("s")).collect()[0].s
    assert s == "0.300000"
