"""Operator tests for temporal joins: as-of semantics on planted
sequences, range-join bucket-boundary cases, gap-fill densification."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mdio_python_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
    gap_fill_hours,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def test_asof_picks_latest_at_or_before(spark):
    left = _df(spark, [(1, 100, 50), (2, 101, 10)], "k long, lid long, us long")
    right = _df(
        spark,
        [(1, 200, 20), (1, 201, 50), (1, 202, 60), (2, 203, 99)],
        "k long, rid long, rus long",
    )
    out = {
        r.lid: (r.rid, r.rus)
        for r in asof_join(
            left, right, ["k"], "us", "rus", ["rid", "rus"]
        ).collect()
    }
    # lid=100 at us=50: rid=201 (us=50 inclusive) beats 200; 202 is later.
    assert out[100] == (201, 50)
    # lid=101 at us=10: no right row at-or-before -> nulls.
    assert out[101] == (None, None)


def test_asof_no_cross_key_leakage(spark):
    left = _df(spark, [(1, 100, 50)], "k long, lid long, us long")
    right = _df(spark, [(2, 200, 10)], "k long, rid long, rus long")
    [r] = asof_join(left, right, ["k"], "us", "rus", ["rid"]).collect()
    assert r.rid is None


def test_asof_duplicate_right_ts_resolves_to_greatest_payload(spark):
    left = _df(spark, [(1, 100, 50)], "k long, lid long, us long")
    right = _df(
        spark, [(1, 200, 40), (1, 205, 40)], "k long, rid long, rus long"
    )
    [r] = asof_join(left, right, ["k"], "us", "rus", ["rid"]).collect()
    assert r.rid == 205  # greatest payload struct wins the tie


# ---------------------------------------------------------------------------
# bucketed_range_join
# ---------------------------------------------------------------------------


def test_range_join_spans_bucket_boundary(spark):
    # horizon 100: left at us=95 must see right at us=105 (next bucket)
    # and us=195 (95+100, inclusive), not us=196.
    left = _df(spark, [(1, 10, 95)], "k long, lid long, us long")
    right = _df(
        spark,
        [(1, 20, 105), (1, 21, 195), (1, 22, 196), (1, 23, 95)],
        "k long, rid long, rus long",
    )
    out = bucketed_range_join(left, right, ["k"], 100, "us", "rus")
    assert {r.rid for r in out.collect()} == {20, 21}


def test_range_join_exclusive_lower_inclusive_upper(spark):
    left = _df(spark, [(1, 10, 100)], "k long, lid long, us long")
    right = _df(
        spark, [(1, 20, 100), (1, 21, 200)], "k long, rid long, rus long"
    )
    out = bucketed_range_join(left, right, ["k"], 100, "us", "rus")
    assert {r.rid for r in out.collect()} == {21}  # rus=100 excluded (> not >=)


def test_range_join_unmatched_left_survives_once_with_nulls(spark):
    left = _df(spark, [(1, 10, 50), (1, 11, 60)], "k long, lid long, us long")
    right = _df(spark, [(1, 20, 500)], "k long, rid long, rus long")
    rows = bucketed_range_join(left, right, ["k"], 100, "us", "rus").collect()
    assert len(rows) == 2
    assert all(r.rid is None for r in rows)
    assert {r.lid for r in rows} == {10, 11}


def test_range_join_no_double_count_same_bucket(spark):
    # left and a matching right in the SAME bucket: exploded left probes
    # buckets {0, 1}; the right row is only in bucket 0 -> exactly one pair.
    left = _df(spark, [(1, 10, 10)], "k long, lid long, us long")
    right = _df(spark, [(1, 20, 50)], "k long, rid long, rus long")
    rows = bucketed_range_join(left, right, ["k"], 100, "us", "rus").collect()
    assert len(rows) == 1 and rows[0].rid == 20


# ---------------------------------------------------------------------------
# gap_fill_hours
# ---------------------------------------------------------------------------


def test_gap_fill_densifies_missing_cells(spark):
    t0 = dt.datetime(2024, 1, 1, 0)
    t2 = dt.datetime(2024, 1, 1, 2)
    hourly = spark.createDataFrame(
        [(t0, "a", 5), (t2, "a", 7), (t0, "b", 1)],
        "hour_ts timestamp, event_type string, n_events long",
    )
    out = gap_fill_hours(
        hourly, ["event_type"], "hour_ts", fill={"n_events": F.lit(0)}
    )
    got = {(r.hour_ts, r.event_type): r.n_events for r in out.collect()}
    assert len(got) == 6  # 3 hours x 2 types
    t1 = dt.datetime(2024, 1, 1, 1)
    assert got[(t1, "a")] == 0 and got[(t1, "b")] == 0
    assert got[(t2, "b")] == 0
    assert got[(t0, "a")] == 5 and got[(t2, "a")] == 7


# ---------------------------------------------------------------------------
# asof_join skew guard (bucket_us)
# ---------------------------------------------------------------------------


def test_asof_bucketed_cross_bucket_carry(spark):
    # bucket width 100: right at us=20 (bucket 0) must reach left rows in
    # buckets 2 and 5 via the carry table; a later right at us=350 (bucket
    # 3) overrides for the bucket-5 left row.
    left = _df(
        spark, [(1, 100, 250), (1, 101, 550)], "k long, lid long, us long"
    )
    right = _df(
        spark, [(1, 200, 20), (1, 201, 350)], "k long, rid long, rus long"
    )
    out = {
        r.lid: r.rid
        for r in asof_join(
            left, right, ["k"], "us", "rus", ["rid"], bucket_us=100
        ).collect()
    }
    assert out == {100: 200, 101: 201}


def test_asof_bucketed_no_predecessor_stays_null(spark):
    left = _df(spark, [(1, 100, 250)], "k long, lid long, us long")
    right = _df(spark, [(1, 200, 900)], "k long, rid long, rus long")
    [r] = asof_join(
        left, right, ["k"], "us", "rus", ["rid"], bucket_us=100
    ).collect()
    assert r.rid is None


def test_asof_bucketed_duplicate_ts_tie_matches_default(spark):
    left = _df(spark, [(1, 100, 50)], "k long, lid long, us long")
    right = _df(
        spark, [(1, 200, 40), (1, 205, 40)], "k long, rid long, rus long"
    )
    [r] = asof_join(
        left, right, ["k"], "us", "rus", ["rid"], bucket_us=10
    ).collect()
    assert r.rid == 205  # same greatest-payload rule as the default plan


def test_asof_bucketed_window_partitions_by_bucket(spark):
    """The skew guard's point: the corpus-sized running window must key on
    (k, _bkt), not k alone — pin it in the optimized plan."""
    left = _df(spark, [(1, 100, 50)], "k long, lid long, us long")
    right = _df(spark, [(1, 200, 40)], "k long, rid long, rus long")
    out = asof_join(left, right, ["k"], "us", "rus", ["rid"], bucket_us=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(k#" in plan and "_bkt#" in plan
    first_spec = plan.index("windowspecdefinition(k#")
    assert "_bkt#" in plan[first_spec : first_spec + 200]


def test_asof_bucketed_rejects_nonpositive_width(spark):
    left = _df(spark, [(1, 100, 50)], "k long, lid long, us long")
    right = _df(spark, [(1, 200, 40)], "k long, rid long, rus long")
    import pytest

    with pytest.raises(ValueError, match="bucket_us"):
        asof_join(left, right, ["k"], "us", "rus", ["rid"], bucket_us=0)
