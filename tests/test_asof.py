"""Union-sort as-of join semantics (operators/asof.py)."""

from datetime import datetime

from geo_sim_processing_a_spark.operators.asof import as_of_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00"), "a"),
         (1, ts("2024-01-01T12:00"), "b"),
         (2, ts("2024-01-01T11:00"), "c"),
         (3, ts("2024-01-01T11:00"), "d")],
        "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00"), 100.0),
         (1, ts("2024-01-01T11:30"), 200.0),
         (2, ts("2024-01-01T11:00"), 300.0)],
        "k long, rt timestamp, v double")
    out = {(r["k"], r["tag"]): r["asof_v"]
           for r in as_of_join(left, right, "k", "t", "rt", ["v"]).collect()}
    assert out[(1, "a")] == 100.0      # latest <= 10:00
    assert out[(1, "b")] == 200.0      # latest <= 12:00
    assert out[(2, "c")] == 300.0      # equal timestamp matches (non-strict)
    assert out[(3, "d")] is None       # no right rows for key 3


def test_asof_strict(spark):
    left = spark.createDataFrame([(2, ts("2024-01-01T11:00"), "c")],
                                 "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        [(2, ts("2024-01-01T11:00"), 300.0), (2, ts("2024-01-01T10:00"), 50.0)],
        "k long, rt timestamp, v double")
    out = as_of_join(left, right, "k", "t", "rt", ["v"], strict=True).collect()
    assert out[0]["asof_v"] == 50.0    # equal timestamp excluded when strict


def test_asof_null_value_column_does_not_mix_rows(spark):
    """The matched right ROW's values come back atomically: a NULL in
    one value column of the latest row must NOT be back-filled from an
    older row (per-column last(ignorenulls) would stitch rows)."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00"))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00"), 5.0, 1.0),
         (1, ts("2024-01-01T11:00"), None, 7.0)],
        "k long, rt timestamp, a double, b double")
    row = as_of_join(left, right, "k", "t", "rt", ["a", "b"]).collect()[0]
    assert row["asof_b"] == 7.0
    assert row["asof_a"] is None, "NULL column must not be filled from an older row"


def test_asof_null_right_time_matches_nothing(spark):
    """A right row with a NULL timestamp satisfies no comparison — it
    must not act as an 'earliest prior' match."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00"))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k long, rt timestamp, v double")
    row = as_of_join(left, right, "k", "t", "rt", ["v"]).collect()[0]
    assert row["asof_v"] is None
