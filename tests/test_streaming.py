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
