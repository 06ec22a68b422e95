"""Streaming smoke tests: bounded file stream driven to completion via the
memory sink; results cross-checked against the equivalent batch query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.sources.tables import load_table
from mdio_python_spark.streaming import events as se

SF = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark):
    stream = se.stream_events(spark, SF)
    agg = se.windowed_counts(stream, window="1 hour")
    got = se.run_to_memory(agg, "win_counts").toPandas()

    batch = load_table(spark, SF, "events")
    expect = (
        batch.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    assert len(got) == len(expect)
    assert int(got["n_events"].sum()) == int(expect["n_events"].sum()) == batch.count()


def test_sessionization(spark):
    stream = se.stream_events(spark, SF)
    sess = se.sessionized(stream, gap="30 minutes")
    got = se.run_to_memory(sess, "sessions").toPandas()
    assert (got["n_events"] >= 1).all()
    # sessions per user are disjoint time ranges
    one = got[got.user_id == got.user_id.iloc[0]].sort_values("session_start")
    starts, ends = list(one["session_start"]), list(one["session_end"])
    assert all(e1 <= s2 for e1, s2 in zip(ends, starts[1:]))
    # total events conserved
    batch_n = load_table(spark, SF, "events").count()
    assert int(got["n_events"].sum()) == batch_n


def test_streaming_dedup_drops_redelivered_events(spark):
    """An at-least-once source delivering every event twice (two staged
    copies of the file) collapses back to the exact batch cardinality
    through dropDuplicatesWithinWatermark."""
    stream = se.stream_events(spark, SF, copies=2)
    got = se.run_to_memory(se.deduped(stream), "dedup_events", "append")
    batch_n = load_table(spark, SF, "events").count()
    assert got.count() == batch_n
    assert got.select("event_id").distinct().count() == batch_n


def test_stream_static_enrichment_join(spark):
    """Stream-static broadcast join: every event row survives (left join)
    and matched rows carry the dimension attribute."""
    stream = se.stream_events(spark, SF)
    users = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    out = se.run_to_memory(
        se.enriched(stream, users).select("event_id", "user_id", "segment"),
        "enriched_events",
        "append",
    )
    batch = load_table(spark, SF, "events")
    assert out.count() == batch.count()
    n_matched = out.where(F.col("segment").isNotNull()).count()
    expect_matched = (
        batch.join(users, "user_id", "inner").count()
    )
    assert n_matched == expect_matched


def test_user_running_stats_stateful(spark):
    """applyInPandasWithState custom stateful operator: after draining the
    bounded stream, the latest per-user state row equals the batch
    aggregate over the same data."""
    from pyspark.sql import functions as F

    from mdio_python_spark.sources.tables import load_table
    from mdio_python_spark.streaming import events as ev

    stream = ev.stream_events(spark, SF)
    out = ev.run_to_memory(
        ev.user_running_stats(stream), "user_running_stats_t", "update"
    )
    # update mode may emit multiple rows per user across batches; the
    # final state per user is the row with the max n_events
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "n_events", "total_value", "max_value")
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
    )
    f = {r["user_id"]: r for r in final.collect()}
    b = {r["user_id"]: r for r in batch.collect()}
    assert set(f) == set(b)
    for uid in b:
        assert f[uid]["n_events"] == b[uid]["n_events"]
        assert abs(f[uid]["total_value"] - b[uid]["total_value"]) < 1e-6
        assert f[uid]["max_value"] == b[uid]["max_value"]


def test_normalize_ts_handles_layout_drift(spark):
    """The driver's on-disk ts layout changed twice across rounds (int64
    nanos -> timestamp[us] NTZ); normalize_nanos_ts must converge every
    plausible layout to the same UTC TimestampType values."""
    from datetime import datetime, timezone

    from mdio_python_spark.sources.tables import normalize_nanos_ts

    want = datetime(2024, 3, 1, 12, 30, 15)
    us = int(datetime(2024, 3, 1, 12, 30, 15, tzinfo=timezone.utc).timestamp() * 1_000_000)

    variants = {
        "bigint": spark.createDataFrame([(us * 1000,)], "ts long"),
        "int_seconds": spark.sql(
            f"SELECT CAST({us // 1_000_000} AS INT) AS ts"
        ),
        "string": spark.createDataFrame([("2024-03-01 12:30:15",)], "ts string"),
        "timestamp_ntz": spark.sql(
            "SELECT TIMESTAMP_NTZ '2024-03-01 12:30:15' AS ts"
        ),
        "timestamp": spark.sql("SELECT TIMESTAMP '2024-03-01 12:30:15' AS ts"),
    }
    for label, df in variants.items():
        out = normalize_nanos_ts(df)
        assert dict(out.dtypes)["ts"] == "timestamp", label
        got = out.collect()[0]["ts"]
        assert got.replace(tzinfo=None) == want, (label, got)


# --- exact-equality gates for the declared streaming queries (VERDICT r4) ---
# These are the "local:" oracles the registry declares for the rows-only
# streaming queries: FULL-FRAME equality against the equivalent batch
# computation, not just row counts.


def _frames_equal(got, want, keys):
    import pandas as pd

    got = got.reindex(sorted(got.columns), axis=1).sort_values(keys, ignore_index=True)
    want = want.reindex(sorted(want.columns), axis=1).sort_values(
        keys, ignore_index=True
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_streaming_hourly_equals_batch_frame(spark):
    from mdio_python_spark.plans.registry import registry

    reg = registry()
    got = reg["streaming_events_hourly"].fn(spark, SF).toPandas()
    batch = (
        load_table(spark, SF, "events")
        .groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    _frames_equal(got, batch, ["hour", "event_type"])


def test_streaming_sessions_equals_batch_frame(spark):
    """Same session_window logical plan, two execution modes (streaming
    state store vs batch agg) — outputs must be identical frames."""
    from mdio_python_spark.plans.registry import registry

    got = registry()["streaming_user_sessions"].fn(spark, SF).toPandas()
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("end"),
            "user_id",
            "n_events",
        )
        .toPandas()
    )
    _frames_equal(got, batch, ["user_id", "start"])


def test_streaming_dedup_exact_cardinality(spark):
    """Replayed-twice stream deduped back to EXACTLY the batch per-type
    frame (counts and distinct counts)."""
    from mdio_python_spark.plans.registry import registry

    got = registry()["streaming_dedup_replayed"].fn(spark, SF).toPandas()
    batch = (
        load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_id").alias("n_distinct_events"),
        )
        .toPandas()
    )
    _frames_equal(got, batch, ["event_type"])


def test_streaming_interval_join_equals_batch_pairs(spark):
    """Exact gate for streaming_error_click_pairs: the stream-stream
    interval join's pair set must equal the batch bucketed_range_join's
    matched pairs, frame-for-frame."""
    from mdio_python_spark.operators.temporal import bucketed_range_join
    from mdio_python_spark.plans.registry import registry

    got = (
        registry()["streaming_error_click_pairs"]
        .fn(spark, SF)
        .toPandas()
        .sort_values(["user_id", "l_id", "r_id"], ignore_index=True)
    )

    ev = load_table(spark, SF, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("l_id"), F.col("us").alias("l_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("r_id"),
        F.col("us").alias("r_us"),
    )
    pairs = bucketed_range_join(
        errors,
        clicks.withColumnRenamed("c_user", "user_id"),
        ["user_id"],
        horizon_us=300_000_000,
        left_us="l_us",
        right_us="r_us",
        dedup_unmatched=False,
    )
    expect = (
        pairs.where(F.col("r_id").isNotNull())
        .select(
            "user_id", "l_id", "r_id",
            (F.col("r_us") - F.col("l_us")).alias("lag_us"),
        )
        .toPandas()
        .sort_values(["user_id", "l_id", "r_id"], ignore_index=True)
    )
    assert len(got) == len(expect) > 0
    assert got[["user_id", "l_id", "r_id", "lag_us"]].equals(
        expect[["user_id", "l_id", "r_id", "lag_us"]]
    )


def test_streaming_hll_equals_batch(spark):
    """The streaming register aggregate must finalize to the EXACT same
    estimates as batch hll_distinct over the same rows (register max is
    order-free, so incremental vs one-shot aggregation cannot differ)."""
    from pyspark.sql import functions as F

    from mdio_python_spark.operators.stats import hll_distinct
    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.sources.tables import load_table

    out = (
        registry()["streaming_hourly_distinct_users"]
        .fn(spark, SF)
        .toPandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    ev = load_table(spark, SF, "events").select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
        "user_id",
    )
    batch = (
        hll_distinct(ev, ["hour", "event_type"], "user_id")
        .toPandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    assert len(out) == len(batch) > 0
    assert (out["hour"] == batch["hour"]).all()
    assert (out["event_type"] == batch["event_type"]).all()
    assert (out["hll_estimate"].values == batch["hll_estimate"].values).all()


def test_streaming_countmin_equals_batch(spark):
    """Every streaming count-min cell must equal the batch
    stats.countmin_cells value over the same rows — additive integer
    counts are order-free, so incremental aggregation cannot differ."""
    from pyspark.sql import functions as F

    from mdio_python_spark.operators.stats import _cms_buckets
    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.sources.tables import load_table

    keys = ["hour", "r", "bucket"]
    out = (
        registry()["streaming_hourly_countmin"]
        .fn(spark, SF)
        .toPandas()
        .sort_values(keys, ignore_index=True)
    )
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            F.posexplode(_cms_buckets("user_id", "cms")).alias("r", "bucket"),
        )
    )
    batch = (
        ev.groupBy("hour", "r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
        .toPandas()
        .sort_values(keys, ignore_index=True)
    )
    assert len(out) == len(batch) > 0
    for c in keys + ["cell_count"]:
        assert (out[c] == batch[c]).all(), c
