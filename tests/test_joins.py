"""salted_join: equivalence with the plain join, salt spreading, and the
join-key shape (salt must be part of the equi-join keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mdio_python_spark.operators.joins import SALT_COL, salted_join


@pytest.fixture
def skewed(spark):
    # 9000 rows on one hot key, 1000 spread over 100 keys
    left = spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit(7))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return left, right


def test_salted_inner_equals_plain(spark, skewed):
    left, right = skewed
    got = salted_join(left, right, "k", salt=8)
    want = left.join(right, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_left_preserves_unmatched(spark, skewed):
    left, _ = skewed
    right = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    got = salted_join(left, right, "k", how="left", salt=4)
    want = left.join(right, "k", "left")
    assert got.count() == want.count() == left.count()
    assert (
        got.where(F.col("w").isNull()).count()
        == want.where(F.col("w").isNull()).count()
    )


def test_salt_actually_spreads_hot_key(spark, skewed):
    left, _ = skewed
    salted = left.withColumn(
        SALT_COL,
        F.pmod(
            F.hash(
                F.struct(*left.columns),
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(8),
        ),
    )
    spread = (
        salted.where(F.col("k") == 7).groupBy(SALT_COL).count().collect()
    )
    assert len(spread) == 8  # hot key occupies all salt buckets
    counts = [r["count"] for r in spread]
    assert max(counts) < 9000 * 0.3  # no bucket holds the whole key


def test_salt_spreads_identical_duplicate_rows(spark):
    """The classic skew shape: byte-identical duplicates of one hot key.
    A content-only hash sends all of them to ONE salt bucket; mixing in the
    per-physical-row id must spread them."""
    left = (
        spark.range(8000)
        .select(F.lit(7).alias("k"), F.lit("same").alias("v"))
        .repartition(8)
    )
    right = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    got = salted_join(left, right, "k", salt=8)
    assert got.count() == 8000
    # inspect spread with the production salt expression
    from mdio_python_spark.operators import joins as J

    salted = left.withColumn(
        J.SALT_COL,
        F.pmod(
            F.hash(
                F.struct(*left.columns),
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(8),
        ),
    )
    spread = salted.groupBy(J.SALT_COL).count().collect()
    assert len(spread) == 8
    assert max(r["count"] for r in spread) < 8000 * 0.3


def test_salted_join_tolerates_map_columns(spark):
    """F.hash rejects MapType; the salt must skip map columns, not throw."""
    left = spark.range(100).select(
        (F.col("id") % 3).alias("k"),
        F.create_map(F.lit("a"), F.col("id")).alias("m"),
    )
    right = spark.range(3).select(F.col("id").alias("k"), F.lit(9).alias("w"))
    got = salted_join(left, right, "k", salt=4)
    want = left.join(right, "k")
    assert got.count() == want.count() == 100


def test_salted_join_is_equi_join_on_salt(spark, skewed):
    left, right = skewed
    plan = (
        salted_join(left, right, "k", salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert SALT_COL in plan  # salt participates in the join keys
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, plan


def test_salted_join_rejects_bad_args(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", salt=1)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_salted_join_rejects_salt_column_collision(spark):
    from pyspark.sql import functions as F

    left = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias(SALT_COL))
    right = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="_salt"):
        salted_join(left, right, "k")


def test_salted_join_tolerates_nested_map_columns(spark):
    """Regression (r4 review): maps nested in arrays/structs must also be
    excluded from the salt's content hash, not just top-level maps."""
    left = spark.createDataFrame(
        [(1, [{"a": 1}], (2, {"b": 2}))],
        "k long, am array<map<string,int>>, sm struct<x:int, m:map<string,int>>",
    )
    right = spark.createDataFrame([(1, 10)], "k long, w int")
    [row] = salted_join(left, right, "k", salt=4).collect()
    assert row.w == 10
