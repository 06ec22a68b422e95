"""Temporal join operators: as-of join, bounded range join, gap fill.

Beyond-reference surface (the reference has no timestamped-event model at
all) — the three temporal shapes every event/telemetry pipeline needs and
vanilla Spark SQL lacks as primitives:

- **as-of join** (``asof_join``): for each left row, the latest right row
  with the same key at-or-before the left timestamp. Implemented as a
  union + one ``last(..., ignorenulls)`` running window — ONE shuffle on
  the key, no range self-join, state per window is a single struct. This
  is the plan a 100 TB attribution join needs: a naive
  ``l JOIN r ON key AND r.ts <= l.ts`` + argmax explodes quadratically
  within hot keys; the union-window form is linear and sorts once.
- **bounded range join** (``bucketed_range_join``): pairs within a fixed
  horizon after the left event. Both sides bucket by
  ``floor(us / horizon)``; a window of width <= horizon crosses at most
  one bucket boundary, so the left side explodes to exactly two buckets
  and the join is a plain equi-join on ``(key, bucket)`` with a residual
  range filter — Catalyst never sees a non-equi join condition, so there
  is no BroadcastNestedLoopJoin cliff at scale.
- **gap fill** (``gap_fill_hours``): densify an hourly aggregate so every
  (hour, group) cell exists with a zero default. The corpus-sized work is
  the combinable pre-aggregate; the densify step runs on the tiny
  post-agg table (hours x groups) via ``sequence()`` + explode.

All timestamp comparisons use integer microseconds (``unix_micros``) so
the DuckDB oracles (``epoch_ns(ts) // 1000``) agree bit-for-bit; declared
outputs carry no raw timestamps (driver hashing treats ns/us differently).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_us: str = "us",
    right_us: str = "us",
    payload_cols: Sequence[str] = (),
    bucket_us: int | None = None,
) -> DataFrame:
    """Inclusive as-of join: latest right row per key with ``right_us <=
    left_us``; left rows with no predecessor keep null payloads.

    Both inputs must carry integer-microsecond columns. ``payload_cols``
    are the right-side columns to attach (suffixed names must not collide
    with left columns). Ties at identical timestamps resolve
    right-before-left (inclusive semantics, matching DuckDB ``ASOF JOIN``
    on ``>=``); duplicate right timestamps within a key resolve to the
    row with the greatest payload struct — supply a unique id in
    ``payload_cols`` for determinism.

    Default plan (``bucket_us=None``) — one exchange: the union shuffles
    once on ``keys``; the running ``last(ignorenulls)`` window keeps O(1)
    state per key. At 1000 executors a hot key serializes its own window.

    Skew-guarded plan (``bucket_us=<width>``) — the window partitions by
    ``(keys, floor(us / bucket_us))`` so a hot key spreads across its
    time buckets; predecessors in earlier buckets arrive via a carry
    table (latest right payload per (key, bucket), rolled forward with a
    per-key prefix window over the TINY bucket summary — the same
    two-level prefix shape as ``packing.global_running_sum``). Cost: one
    extra equi-join on ``(keys, bucket)`` against the summary (AQE
    broadcasts it when small). Pick ``bucket_us`` so one bucket of the
    hottest key fits a task — e.g. 1 hour for event streams.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        *keys,
        F.col(right_us).alias("_us"),
        F.lit(0).alias("_side"),
        payload,
    )
    l = left.select(
        "*",
        F.col(left_us).alias("_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    unioned = r.unionByName(l, allowMissingColumns=True)
    if bucket_us is None:
        w = (
            Window.partitionBy(*keys)
            # _side 0 < 1 makes a right row at ts T visible to a left row at
            # T; _asof_payload last for identical right ts (documented).
            .orderBy("_us", "_side", "_asof_payload")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = unioned.withColumn(
            "_match", F.last("_asof_payload", ignorenulls=True).over(w)
        )
    else:
        if bucket_us <= 0:
            raise ValueError("bucket_us must be positive")
        unioned = unioned.withColumn(
            "_bkt", F.floor(F.col("_us") / F.lit(bucket_us))
        )
        w_in = (
            Window.partitionBy(*keys, "_bkt")
            .orderBy("_us", "_side", "_asof_payload")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        within = unioned.withColumn(
            "_match_in", F.last("_asof_payload", ignorenulls=True).over(w_in)
        )
        # Carry: latest right payload strictly before each bucket's start.
        # max(struct(_us, payload)) reproduces the main ordering's tie rule
        # (greatest payload wins identical timestamps). The summary has one
        # row per (key, active bucket) — post-aggregate small — and the
        # per-key prefix window over it touches #buckets rows per key, not
        # corpus rows, so the hot key no longer serializes its own data.
        bucket_last = (
            unioned.where(F.col("_side") == 0)
            .groupBy(*keys, "_bkt")
            .agg(F.max(F.struct("_us", "_asof_payload")).alias("_mx"))
        )
        all_buckets = unioned.select(*keys, "_bkt").distinct()
        w_carry = (
            Window.partitionBy(*keys)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = (
            all_buckets.join(bucket_last, [*keys, "_bkt"], "left")
            .withColumn("_carry", F.max("_mx").over(w_carry))
            .select(*keys, "_bkt", F.col("_carry._asof_payload").alias("_cp"))
        )
        matched = (
            within.join(carries, [*keys, "_bkt"], "left")
            .withColumn("_match", F.coalesce("_match_in", "_cp"))
            .drop("_bkt", "_match_in", "_cp")
        )
    out = matched.where(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"_match.{c}"))
    return out.drop("_us", "_side", "_asof_payload", "_match")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    horizon_us: int,
    left_us: str = "us",
    right_us: str = "us",
    dedup_unmatched: bool = True,
) -> DataFrame:
    """Left-outer pairs ``(left row, right row)`` with the same key and
    ``left_us < right_us <= left_us + horizon_us``.

    Returns the left columns plus the right columns (caller guarantees
    disjoint names); unmatched left rows appear once with null right
    columns. Each right row lands in exactly one time bucket while the
    left row probes its own bucket and the next, so downstream counts
    never double-count and the join is pure equi-join shuffle on
    ``(key, bucket)`` — skew-safe under AQE, no nested-loop fallback.

    Exact left-outer semantics need one extra exchange: a left row whose
    two exploded probes match in only ONE bucket also produces a null row
    from the other, removed here by an any-match window over a per-row id.
    Consumers that aggregate per left row with null-ignoring aggregates
    (``count(right_col)``) absorb those extras for free — pass
    ``dedup_unmatched=False`` to skip the window and its shuffle (at most
    one spurious null-extended row per matched left row).
    """
    bucket = lambda c: F.floor(F.col(c) / F.lit(horizon_us))  # noqa: E731
    if dedup_unmatched:
        left = left.withColumn("_lrow", F.monotonically_increasing_id())
    l = left.withColumn(
        "_bucket", F.explode(F.array(bucket(left_us), bucket(left_us) + 1))
    )
    # Prefix the right-side join columns so the range predicate can live in
    # the join condition — a post-join filter on right columns would silently
    # turn matched-but-out-of-range left rows into dropped rows instead of
    # null-extended ones.
    r = right.withColumn("_r_bucket", bucket(right_us))
    for k in keys:
        r = r.withColumnRenamed(k, f"_r_{k}")
    cond = F.col("_bucket") == F.col("_r_bucket")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    cond = (
        cond
        & (F.col(right_us) > F.col(left_us))
        & (F.col(right_us) <= F.col(left_us) + F.lit(horizon_us))
    )
    joined = l.join(r, cond, "left")
    # The unmatched-left row survives in both exploded buckets; keep one.
    keep = F.col(right_us).isNotNull() | (F.col("_bucket") == bucket(left_us))
    drop = ["_bucket", "_r_bucket", *[f"_r_{k}" for k in keys]]
    if not dedup_unmatched:
        return joined.where(keep).drop(*drop)
    any_match = F.max(F.col(right_us).isNotNull().cast("int")).over(
        Window.partitionBy("_lrow")
    )
    return (
        joined.withColumn("_any", any_match)
        .where(F.col(right_us).isNotNull() | ((F.col("_any") == 0) & keep))
        .drop("_any", "_lrow", *drop)
    )


def gap_fill_hours(
    hourly: DataFrame,
    group_cols: Sequence[str],
    hour_col: str = "hour_ts",
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Densify an hourly aggregate: emit one row per (hour, group) over
    the full [min hour, max hour] span, filling absent cells from
    ``fill`` (column-name -> default expression).

    ``hourly`` is a post-aggregation table (hours x groups rows — tiny
    even at 100 TB of raw input), so the cross join and the final join
    both broadcast; no corpus-sized work happens here.
    """
    bounds = hourly.agg(
        F.min(hour_col).alias("_lo"), F.max(hour_col).alias("_hi")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias(hour_col)
    )
    groups = hourly.select(*group_cols).distinct()
    grid = hours.crossJoin(F.broadcast(groups))
    out = grid.join(F.broadcast(hourly), [hour_col, *group_cols], "left")
    for name, default in (fill or {}).items():
        out = out.withColumn(name, F.coalesce(F.col(name), default))
    return out
