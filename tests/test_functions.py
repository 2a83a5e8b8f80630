"""Unit tests for the scalar function library (SURVEY §2.8–2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from date_warehouse___airline_project_spark.functions import (
    add_business_days,
    age_years,
    amount_consistent,
    capitalize_first,
    collapse_whitespace,
    date_range_overlap,
    delay_minutes,
    digits_only,
    flight_duration_hours,
    haversine_km,
    in_numeric_range,
    mask_email,
    mask_phone,
    name_first_last,
    prefix_alnum,
    refund_amount,
    strip_currency,
    strip_non_alpha,
    title_case,
)
from date_warehouse___airline_project_spark.functions.dates import to_standard_date
from date_warehouse___airline_project_spark.functions.math_fns import parse_money
from date_warehouse___airline_project_spark.functions.strings import header_sanitize


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("r")).first()["r"]


def test_string_normalizers(spark):
    assert one(spark, collapse_whitespace("c"), c="  a   b  c ") == "a b c"
    assert one(spark, title_case("c"), c="  boeing   737 ") == "Boeing 737"
    assert one(spark, capitalize_first("c"), c="gOLD") == "Gold"
    assert one(spark, strip_currency("c"), c="$1,540.00") == "1540.00"
    assert one(spark, strip_non_alpha("c"), c="gold!2x") == "goldx"
    assert one(spark, digits_only("c"), c="P00123x9") == "001239"
    assert one(spark, prefix_alnum("c"), c="aa-1234") == "AA"


def test_money_parse(spark):
    assert one(spark, parse_money(F.col("c")), c="$1,540.00") == 1540.00
    assert one(spark, parse_money(F.col("c")), c="garbage") is None
    assert one(spark, parse_money(F.col("c")), c="123456789.99") == 99999999.99


def test_header_sanitize():
    assert header_sanitize("Ticket Price ($)") == "ticket_price"
    assert header_sanitize("﻿TransactionID") == "transactionid"


def test_name_split_and_masking(spark):
    first, last = name_first_last("c")
    df = spark.createDataFrame([("Ada Augusta Lovelace",)], ["c"])
    r = df.select(first.alias("f"), last.alias("l")).first()
    assert (r["f"], r["l"]) == ("Ada", "Augusta Lovelace")
    assert one(spark, mask_email("c"), c="alice@example.com") == "al***@example.com"
    assert one(spark, mask_phone("c"), c="+1 (555) 123-4567") == "***4567"


def test_multi_format_dates(spark):
    iso = lambda s: one(  # noqa: E731
        spark, F.date_format(to_standard_date("c"), "yyyy-MM-dd"), c=s
    )
    assert iso("2023-01-10") == "2023-01-10"
    assert iso("01/18/2023") == "2023-01-18"  # MM/dd before dd/MM? see note below
    assert iso("20-Jan-23") == "2023-01-20"
    assert iso("2024/Jan/05") == "2024-01-05"
    assert iso("not a date") is None


def test_date_math(spark):
    assert one(spark, age_years(F.col("c").cast("date"), F.lit("2026-01-01").cast("date")),
               c="2000-01-02") == 25
    assert one(spark, add_business_days(F.col("c"), 3), c="2026-08-07") is not None  # Fri +3 → Wed
    df = spark.createDataFrame([("2026-08-07",)], ["c"])
    got = df.select(add_business_days(F.col("c"), 3).cast("string").alias("r")).first()["r"]
    assert got == "2026-08-12"
    assert one(
        spark,
        delay_minutes(
            F.lit("2026-01-01 10:00:00").cast("timestamp"),
            F.lit("2026-01-01 12:05:30").cast("timestamp"),
        ),
        c="x",
    ) == 126
    assert one(
        spark,
        flight_duration_hours(
            F.lit("2026-01-01 10:00:00").cast("timestamp"),
            F.lit("2026-01-01 12:30:00").cast("timestamp"),
        ),
        c="x",
    ) == 2.5
    assert one(
        spark,
        date_range_overlap(
            F.lit("2026-01-01").cast("date"), F.lit("2026-01-10").cast("date"),
            F.lit("2026-01-05").cast("date"), F.lit("2026-01-20").cast("date"),
        ),
        c="x",
    ) is True


def test_numeric_checks(spark):
    assert one(spark, haversine_km(F.lit(40.64), F.lit(-73.78), F.lit(51.47), F.lit(-0.45)),
               c="x") - 5540 < 20  # JFK→LHR ≈ 5540 km
    assert one(spark, amount_consistent(F.lit(100.0), F.lit(10.0), F.lit(5.0), F.lit(115.0)),
               c="x") is True
    assert one(spark, refund_amount(F.lit(200.0), F.lit(25.0)), c="x") == 150.0
    assert one(spark, in_numeric_range(F.lit("77"), 0, 100), c="x") is True
    assert one(spark, in_numeric_range(F.lit("abc"), 0, 100), c="x") is False


def test_hll_registers_merge_by_register_max(spark):
    # HLL's streaming/partition-merge contract: registers over a union
    # equal the per-register MAX of the halves' registers — the property
    # that makes the sketch a valid partial aggregate and state-table fold.
    from pyspark.sql import functions as F

    from date_warehouse___airline_project_spark.plans.sketches import hll_registers

    rows = spark.range(0, 2000).select((F.col("id") * 37 % 613).alias("k"))
    # OVERLAPPING segments (keys divisible by 6 are in both), the shape
    # hll_set_algebra merges: MAX must be idempotent on the shared keys.
    a = rows.filter(F.col("k") % 2 == 0)
    b = rows.filter(F.col("k") % 3 == 0)
    merged = (
        hll_registers(a, "k")
        .unionByName(hll_registers(b, "k"))
        .groupBy("idx")
        .agg(F.max("r").alias("r"))
    )
    got = {row.idx: row.r for row in merged.collect()}
    want = {
        row.idx: row.r
        for row in hll_registers(a.unionByName(b).distinct(), "k").collect()
    }
    assert got == want
