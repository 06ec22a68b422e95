"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (BASELINE.json north star):

- brute-force cosine top-k — the correctness baseline. Dot products are
  explicit left-fold double sums (zip_with + aggregate) so the oracle's
  list_reduce fold produces bit-identical doubles.
- sign-bucket ANN (IVF/LSH-style) — the scale path: bucket by the sign
  pattern of the leading dimensions, search within bucket. At 100 TB the
  bucket key becomes the partition/cluster key and each probe touches one
  bucket instead of the full corpus.

No UDFs: array expressions are JVM-side (codegen'd higher-order functions).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product: deterministic evaluation order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every candidate.

    The query side is expected to be small (it is broadcast); the candidate
    scan parallelizes over the corpus. Ties broken by candidate id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            F.expr(_sql_cosine("`q_vec`", "`c_vec`")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def sign_bucket(vec: Column | str, bits: int = 8) -> Column:
    """IVF-style coarse bucket: sign pattern of the first ``bits`` dims.

    A degenerate (data-independent) random-hyperplane LSH — axis-aligned
    planes. Deterministic, oracle-expressible, and the right *shape* for the
    scale path: bucket id becomes the partition key.

    ``vec`` as a str is a SQL fragment — the whole bit chain then builds
    as ONE server-parsed expression (see the SQL-builder note below:
    ~bits×7 py4j round-trips per call site otherwise, and this helper
    sits inside eager-timed query construction).
    """
    if isinstance(vec, str):
        return F.expr(_sql_sign_bucket(vec, bits))
    b = F.lit(0).cast("long")
    for i in range(bits):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return b


def bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via sign-bucket co-partitioning: candidates scored only within
    the query's bucket — the equi-join prunes the cross product."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(_q(vec_col), bits).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(_q(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            "bucket",
            F.expr(_sql_cosine("`q_vec`", "`c_vec`")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "bucket", "cosine", "rank")
    )


def band_sign_bucket(vec: Column | str, band: int, bits: int) -> Column:
    """Sign bucket over the ``band``-th block of ``bits`` dimensions —
    band 0 is :func:`sign_bucket`'s leading block, band b uses dims
    ``[b*bits, (b+1)*bits)``. Multiple bands give MinHash-LSH-style OR
    semantics over independent hyperplane sets. ``vec`` as a str builds
    the chain as one SQL expression (same contract as
    :func:`sign_bucket`)."""
    if isinstance(vec, str):
        return F.expr(_sql_sign_bucket(vec, bits, band=band))
    b = F.lit(0).cast("long")
    for i in range(bits):
        b = b + F.when(
            F.element_at(vec, band * bits + i + 1) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return b


def multiband_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    bits: int = 6,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN with multiple band tables — the recall fix over single-table
    :func:`bucketed_topk`: a candidate is scored if it agrees with the
    query's sign pattern in ANY of ``bands`` disjoint dimension blocks
    (OR-amplification, exactly MinHash-LSH's banding applied to
    hyperplane LSH). Matches dedup via max-of-identical cosine;
    ``n_bands`` reports how many bands agreed (a free match-confidence
    diagnostic). At scale each band table is partition-pruned
    independently — bands multiply probe cost, not corpus cost."""

    def banded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        structs = F.expr(
            "array("
            + ",".join(
                f"named_struct('band_id', {bd}, 'bucket', "
                f"{_sql_sign_bucket(_q(vec_col), bits, band=bd)})"
                for bd in range(bands)
            )
            + ")"
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(structs).alias("b"),
        ).select(out_id, out_vec, "b.band_id", "b.bucket")

    q = banded(queries, "query_id", "q_vec")
    c = banded(candidates, "candidate_id", "c_vec")
    matched = (
        c.join(F.broadcast(q), ["band_id", "bucket"])
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            "band_id",
            F.expr(_sql_cosine("`q_vec`", "`c_vec`")).alias("cosine"),
        )
    )
    pairs = matched.groupBy("query_id", "candidate_id").agg(
        F.max("cosine").alias("cosine"),
        F.count_distinct("band_id").alias("n_bands"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "n_bands", "rank")
    )


def _lfold_norm(values) -> float:
    """Left-fold L2 norm matching the oracle's ``list_reduce`` fold order
    bit-for-bit (pairwise/numpy summation would differ in the last ulp)."""
    import math

    acc = 0.0
    for x in values:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _lit_vec(values) -> Column:
    return F.lit([float(x) for x in values])


# --- SQL-text expression builders for literal-vector trees -----------------
#
# Round 10 (VERDICT r9 item 3): the "model-fit/verify family drift" was
# measured to be DRIVER-SIDE PLAN CONSTRUCTION, not execution — building
# dot(vec, 64-float literal) through the Column API costs ~90 ms of py4j
# round-trips per centroid (16-centroid assignment ≈ 1.4 s per Lloyd
# iteration; the sf0.1 embeddings table is 2000 rows, so execution is
# ~0.5 s). The same expression built as ONE ``F.expr`` string parses
# server-side in ~1 ms. These builders emit SQL that parses to the SAME
# operations in the SAME fold order as :func:`dot` / :func:`norm` /
# :func:`l2sq` (zip_with + left-fold aggregate, CAST(x AS DOUBLE)), so
# every value is bit-identical — pinned by the committed-artifact fit
# tests and the DuckDB oracle gates. Double literals use Python ``repr``
# (shortest round-trip decimal; Java's parseDouble is correctly rounded,
# so the parsed double is bit-equal).


def _sql_dbl(x) -> str:
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal component: {v!r}")
    return f"{v!r}D"


def _sql_vec(values) -> str:
    return "array(" + ",".join(_sql_dbl(x) for x in values) + ")"


def _q(name: str) -> str:
    """Backtick-quote a column name for use inside an F.expr fragment."""
    return f"`{name}`"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def _sql_norm(a: str) -> str:
    return f"SQRT({_sql_dot(a, a)})"


def _sql_cosine(a: str, b: str) -> str:
    # same tree as cosine(): dot / (norm(a) * norm(b))
    return f"({_sql_dot(a, b)}) / (({_sql_norm(a)}) * ({_sql_norm(b)}))"


def _sql_sign_bucket(vec_sql: str, bits: int, band: int = 0) -> str:
    # same tree as the Column chain in sign_bucket/band_sign_bucket:
    # CAST(0 AS BIGINT) + per-bit CASE terms, left-associated
    terms = " + ".join(
        f"(CASE WHEN element_at({vec_sql}, {band * bits + i + 1}) > 0 "
        f"THEN {2 ** i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"(CAST(0 AS BIGINT) + {terms})"


def _sql_l2sq(a: str, b: str) -> str:
    # one zip_with computing (x-y)*(x-y) per element: the Column twin
    # builds diffs then squares via a second zip_with, but each element's
    # double and the fold order are identical
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - "
        f"CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def hash_sample(df: DataFrame, mod: int, id_col: str = "vec_id") -> DataFrame:
    """Deterministic ~1/mod sample by id hash — the distributed,
    RNG-free sampling the training paths use (same recipe as
    ``curation.stratified_sample``: a salted-hash threshold, no sort,
    identical members on every run/engine)."""
    if mod <= 1:
        return df
    return df.where(F.pmod(F.hash(F.col(id_col)), F.lit(mod)) == 0)


def ivf_fit_centroids(
    candidates: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Production IVF training path: Lloyd k-means (cosine assignment, the
    same metric ``ivf_topk`` partitions by) on a deterministic hash sample
    of the corpus. Returns centroid literals for ``ivf_topk(centroids=)``.
    Driver traffic is ``iters`` round-trips of k x dim floats; the sample
    never leaves the cluster (``lloyd_step`` aggregates distributed)."""
    from mdio_python_spark.operators.kmeans import kmeans_fit

    sample = hash_sample(candidates, sample_mod or 1, id_col)
    return kmeans_fit(
        sample, k=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
    )


def _resolve_centroids(
    candidates: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]] | None,
) -> tuple[list[tuple[int, list[float]]], dict[int, float]]:
    """Shared by :func:`ivf_topk` / :func:`ivfpq_topk`: the sorted
    centroid literals (fitted when given, id-prefix stand-in otherwise)
    plus their plan-build-time left-fold norms."""
    cents = (
        sorted((int(cid), [float(x) for x in vec]) for cid, vec in centroids)
        if centroids is not None
        else sorted(
            (int(r[0]), list(r[1]))
            for r in candidates.where(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
    )
    return cents, {cid: _lfold_norm(vec) for cid, vec in cents}


def _cell_structs(vec_sql: str, vnorm_sql: str, cents, cnorms) -> Column:
    """(cos, -cid) struct array vs every centroid — ``array_max`` of it
    is the argmax-cosine cell, ``sort_array`` descending gives probe
    order. One shared expression tree so the three assignment sites
    (ivf candidate/query, ivfpq) can never drift apart. Takes SQL text
    for the vector/norm sides and builds the whole literal-heavy array
    in ONE ``F.expr`` (see the SQL-builder note above — ~100x cheaper
    plan construction than the Column API, bit-identical values)."""
    parts = [
        "named_struct('cos', ({dot}) / (({vn}) * {cn}), "
        "'ncid', CAST({ncid} AS BIGINT))".format(
            dot=_sql_dot(vec_sql, _sql_vec(cvec)),
            vn=vnorm_sql,
            cn=_sql_dbl(cnorms[cid]),
            ncid=-cid,
        )
        for cid, cvec in cents
    ]
    return F.expr("array(" + ",".join(parts) + ")")


def ivf_candidate_cells(
    candidates: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """The candidate side of :func:`ivf_topk` as a standalone stage:
    (candidate_id, c_vec, c_norm, cell) via the literal-centroid argmax
    projection. Exposed so a caller probing the SAME index at several
    configurations (ann_tuning_curve's nprobe sweep) can persist this
    corpus projection once and pass it to every :func:`ivf_topk` leg via
    ``candidate_cells=`` — one corpus scan + fold-cosine pass instead of
    one per configuration."""
    cents, cnorms = _resolve_centroids(
        candidates, n_centroids, id_col, vec_col, centroids
    )
    return (
        candidates.select(
            F.col(id_col).alias("candidate_id"),
            F.col(vec_col),
            F.expr(_sql_norm(_q(vec_col))).alias("c_norm"),
        )
        .withColumn(
            "_cells", _cell_structs(_q(vec_col), "`c_norm`", cents, cnorms)
        )
        .select(
            "candidate_id",
            F.col(vec_col).alias("c_vec"),
            "c_norm",
            (-F.array_max("_cells")["ncid"]).alias("cell"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    candidate_cells: DataFrame | None = None,
    arrow: bool = True,
) -> DataFrame:
    """IVF-flat ANN: partition the corpus into ``n_centroids`` Voronoi
    cells, probe the ``nprobe`` nearest cells per query, exact-rank inside.

    The classic inverted-file index (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011 — the IVF part, without PQ
    compression), data-dependent where the sign-bucket/multiband variants
    are data-oblivious. ``centroids`` is the production path: pass the
    output of :func:`ivf_fit_centroids` (sampled Lloyd k-means). When
    omitted, the deterministic id-prefix of the corpus stands in — a
    TEST/ORACLE convention only (it is SQL-expressible so DuckDB can
    cross-check the full plan), not a quality index.

    Scale design: the centroid set is tiny by construction, so cell
    assignment is a **pure projection** — centroid vectors are baked in as
    literals, the argmax runs per-row via ``array_max`` over a
    ``(cosine, -cid)`` struct array, and the corpus is never shuffled or
    joined for assignment. Probes explode query-side only (tiny,
    broadcast). The single shuffle in the whole plan is the final
    per-query top-k window. At 100 TB the cell id doubles as the storage
    partition key, so a probe touches ``nprobe/n_centroids`` of the data.

    ``candidate_cells`` short-circuits the candidate-side projection with
    a prebuilt (persisted) :func:`ivf_candidate_cells` stage — the
    multi-configuration sweep path (that path stays declarative: the
    prebuilt stage already carries the assignment).

    ``arrow=True`` (round 11, default) computes every task's local
    top-k in one vectorized Arrow map pass over the corpus
    (:func:`vector_arrow.ivf_local_topk` — the query sample is
    collected at construction, so consumers are eager) and ranks the
    bounded survivors with one JVM window; the corpus-sized interpreted
    cell projection and the broadcast probe join of interpreted
    zip_with folds disappear. Bit-identical rows (pinned in
    tests/test_vector_arrow.py).
    """
    cents, cnorms = _resolve_centroids(
        candidates, n_centroids, id_col, vec_col, centroids
    )
    if arrow and candidate_cells is None:
        from mdio_python_spark.operators.vector_arrow import ivf_local_topk

        local = ivf_local_topk(
            queries,
            candidates,
            k=k,
            centroids=cents,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
        )
        w_rank = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("candidate_id")
        )
        return (
            local.withColumn("rank", F.row_number().over(w_rank))
            .where(F.col("rank") <= k)
            .select("query_id", "candidate_id", "cell", "cosine", "rank")
        )

    def cell_structs(vnorm_sql: str) -> Column:
        # cosine vs each centroid: dot / (vec_norm * centroid_norm), the
        # centroid norm folded to a Python double at plan-build time.
        return _cell_structs(_q(vec_col), vnorm_sql, cents, cnorms)

    c = (
        candidate_cells
        if candidate_cells is not None
        else ivf_candidate_cells(
            candidates, n_centroids, id_col, vec_col, centroids
        )
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col),
            F.expr(_sql_norm(_q(vec_col))).alias("q_norm"),
        )
        .withColumn("_cells", cell_structs("`q_norm`"))
        .select(
            F.col("query_id"),
            F.col(vec_col).alias("q_vec"),
            "q_norm",
            F.explode(
                F.slice(F.sort_array("_cells", asc=False), 1, nprobe)
            ).alias("_p"),
        )
        .select("query_id", "q_vec", "q_norm", (-F.col("_p")["ncid"]).alias("cell"))
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            "cell",
            F.expr(
                f"({_sql_dot('`q_vec`', '`c_vec`')}) / (`q_norm` * `c_norm`)"
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cell", "cosine", "rank")
    )


def ivf_recall_curve(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    arrow: bool = True,
) -> DataFrame:
    """Aggregate recall@k of the IVF index at every ``probes`` setting
    against the exact top-k — the whole tuning curve as ONE declarative
    pipeline (round 9, VERDICT r8 item 5).

    ``arrow=True`` (round 10, default) computes every leg's local
    top-k in one vectorized Arrow map pass over the corpus
    (:func:`vector_arrow.ivf_recall_local_topk` — the query sample is
    collected at construction, so consumers are eager) and ranks the
    bounded survivors with one JVM window; the leg-exploded broadcast
    cell join of interpreted zip_with folds and its corpus-sized rank
    exchange disappear. Bit-identical rows (pinned in
    tests/test_vector_arrow.py); the rollup below is shared by both
    paths.

    The nprobe legs are NESTED (the cells probed at p are the first p of
    the same descending probe order), and the exhaustive truth is the
    p = n_centroids limit: every candidate sits in exactly one cell, so
    joining a query against ALL cells scores the full corpus — i.e. the
    brute-force :func:`cosine_topk` is just one more leg (leg 0). One
    query-side explode tags (leg, probed cell) rows for leg 0 and each
    p; ONE broadcast cell join scores every leg's candidates in a single
    pass over the corpus; ONE window ranks per (leg, query); a
    (query, candidate) window marks which top-k rows appear in the
    leg-0 truth. No persist, no cache race, no per-configuration
    rebuild: the corpus is scanned once, where the previous shape
    re-derived the candidate assignment and re-ran a separate
    probe-join + window + aggregate job chain per configuration (the 8
    bounded-but-serial SinglePartition joins the round-8 plan audit
    called out).

    Identical numbers by construction: the cell/probe expressions are
    the shared :func:`_cell_structs` tree, the scoring expression and
    the (cosine DESC, candidate_id) tie order are :func:`cosine_topk` /
    :func:`ivf_topk`'s own, and zero-norm NaN cosines rank first under
    DESC in both engines exactly as before."""
    cents, cnorms = _resolve_centroids(
        candidates, n_centroids, id_col, vec_col, centroids
    )
    if arrow:
        from mdio_python_spark.operators.vector_arrow import (
            ivf_recall_local_topk,
        )

        local = ivf_recall_local_topk(
            queries,
            candidates,
            k=k,
            centroids=cents,
            probes=probes,
            id_col=id_col,
            vec_col=vec_col,
        )
        w_rank = Window.partitionBy("leg", "query_id").orderBy(
            F.col("cosine").desc(), F.col("candidate_id")
        )
        top = (
            local.withColumn("rank", F.row_number().over(w_rank))
            .where(F.col("rank") <= k)
            .select("leg", "query_id", "candidate_id")
        )
        return _recall_curve_rollup(top)
    c = ivf_candidate_cells(candidates, n_centroids, id_col, vec_col, cents)
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(_sql_norm(_q(vec_col))).alias("q_norm"),
    ).withColumn(
        "_probes",
        F.sort_array(
            _cell_structs("`q_vec`", "`q_norm`", cents, cnorms),
            asc=False,
        ),
    )
    q_legs = []
    for leg in (0, *probes):
        if leg == 0:
            # the truth leg: every cell — the join then scores the
            # whole corpus per query, exactly cosine_topk's cross join
            probe = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(0.0).alias("cos"),
                            F.lit(-cid).cast("long").alias("ncid"),
                        )
                        for cid, _ in cents
                    ]
                )
            )
        else:
            probe = F.explode(F.slice("_probes", 1, leg))
        q_legs.append(
            q0.select(
                F.lit(leg).cast("long").alias("leg"),
                "query_id",
                "q_vec",
                "q_norm",
                probe.alias("_p"),
            ).select(
                "leg",
                "query_id",
                "q_vec",
                "q_norm",
                (-F.col("_p")["ncid"]).alias("cell"),
            )
        )
    q_all = q_legs[0]
    for ql in q_legs[1:]:
        q_all = q_all.unionByName(ql)
    scored = (
        c.join(F.broadcast(q_all), "cell")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "leg",
            "query_id",
            "candidate_id",
            F.expr(
                f"({_sql_dot('`q_vec`', '`c_vec`')}) / (`q_norm` * `c_norm`)"
            ).alias("cosine"),
        )
    )
    # ONE exchange serves both windows: hashpartitioning(query_id) is a
    # subset of both the (leg, query) rank clustering and the
    # (query, candidate) truth-mark clustering, so the explicit
    # repartition is the plan's only corpus-sized shuffle (each window
    # adds just a partition-local sort). Parallelism is bounded by the
    # query-sample size — the audit's contract, not the corpus's.
    scored = scored.repartition("query_id")
    w = Window.partitionBy("leg", "query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("leg", "query_id", "candidate_id")
    )
    return _recall_curve_rollup(top)


def _recall_curve_rollup(top: DataFrame) -> DataFrame:
    """Shared tail of :func:`ivf_recall_curve`: mark each (leg, query,
    candidate) top-k row that also appears in the leg-0 truth, roll up
    hits per leg, ride the truth size to every row over the tiny agg."""
    w_pair = Window.partitionBy("query_id", "candidate_id")
    marked = top.withColumn(
        "_t",
        F.max(F.when(F.col("leg") == 0, F.lit(1)).otherwise(F.lit(0))).over(
            w_pair
        ),
    )
    agg = marked.groupBy("leg").agg(
        F.count(F.lit(1)).alias("_n_rows"),
        F.sum("_t").cast("long").alias("n_hits"),
    )
    # the truth size rides to every leg row over the |probes|+1-row agg
    w_all = Window.partitionBy()
    return (
        agg.withColumn(
            "n_exact",
            F.max(F.when(F.col("leg") == 0, F.col("_n_rows"))).over(w_all),
        )
        .where(F.col("leg") > 0)
        .select(
            F.col("leg").alias("nprobe"),
            "n_exact",
            "n_hits",
            (
                F.col("n_hits").cast("double") / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.35,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs (a < b) with verification.

    Dedup shape of the ANN scale path: sign-bucket the corpus, generate
    pairs only *within* buckets (no all-pairs scan), then verify
    cosine >= threshold exactly. Single-table LSH — recall is limited to
    pairs agreeing on the leading sign pattern; at 100 TB you add more
    band tables (as in MinHash-LSH) to raise recall, same plan shape.
    """
    from mdio_python_spark.operators.dedup import bucket_pairs

    keyed = vectors.select(
        F.col(id_col), sign_bucket(_q(vec_col), bits).alias("bucket")
    )
    pairs = (
        bucket_pairs(keyed.withColumnRenamed(id_col, "doc_id"), ["bucket"])
        .withColumnRenamed("doc_a", "vec_a")
        .withColumnRenamed("doc_b", "vec_b")
    )
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"))
    return (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.expr(_sql_cosine("`a_vec`", "`b_vec`")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dup_drops(
    vectors: DataFrame,
    threshold: float = 0.35,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy dedup decision from near-dup pairs: drop every vector that
    has a near-dup with a smaller id; report the smallest such keeper."""
    pairs = embedding_near_dup_pairs(vectors, threshold, bits, id_col, vec_col)
    return pairs.groupBy(F.col("vec_b").alias("drop_id")).agg(
        F.min("vec_a").alias("keep_id"),
        F.count(F.lit(1)).alias("n_near_dups"),
    )


def ivf_cell_assignments(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, cell): nearest-centroid cell per vector — the
    shared pure-projection argmax assignment :func:`ivf_topk` /
    :func:`semantic_dedup_drops` / the cluster-QC queries all use.
    Centroid vectors are plan literals, so assignment never shuffles or
    joins the corpus; ``keep_cols`` rides extra columns (a label, a
    source) through the projection for downstream grouping."""
    cents, cnorms = _resolve_centroids(
        vectors, n_centroids, id_col, vec_col, centroids
    )
    return (
        vectors.select(F.col(id_col), *keep_cols, F.col(vec_col))
        .withColumn(
            "_cells",
            _cell_structs(_q(vec_col), _sql_norm(_q(vec_col)), cents, cnorms),
        )
        .select(
            F.col(id_col),
            *keep_cols,
            (-F.array_max("_cells")["ncid"]).alias("cell"),
        )
    )


def ivf_cell_assignments_join(
    vectors: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, _norm, cell): nearest-centroid assignment for LARGE
    centroid sets — the production shape when cells grow ~sqrt(n) with
    the corpus.

    The literal-centroid argmax (:func:`ivf_cell_assignments`) is ideal
    up to a few dozen cells, but its expression tree carries k x dim
    literals and codegen degrades once k reaches the hundreds. Here the
    id-prefix centroid set is a k-row TABLE broadcast against the corpus
    scan (BroadcastNestedLoopJoin — deliberate: the small side is k rows)
    and the per-vector argmax is a map-side-combinable
    ``max(struct(cos, -cid))`` groupBy, so the only exchange carries one
    row per vector. Bit-equal to the literal path: the same left-fold
    dot/norm arithmetic runs per pair row (verified by
    tests/test_similarity.py::test_assignment_join_matches_literal).

    Zero-norm vectors are excluded (cosine undefined — the
    :func:`knn_graph` convention)."""
    cent = vectors.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.expr(_sql_norm(_q(vec_col))).alias("_cnorm"),
    )
    base = vectors.select(
        F.col(id_col), F.col(vec_col), F.expr(_sql_norm(_q(vec_col))).alias("_norm")
    ).where(F.col("_norm") > 0)
    cos = F.expr(
        f"({_sql_dot(_q(vec_col), '`_cvec`')}) / (`_norm` * `_cnorm`)"
    )
    return (
        base.join(F.broadcast(cent))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    cos.alias("cos"), (-F.col("_cid")).cast("long").alias("ncid")
                )
            ).alias("_m"),
            F.first(vec_col).alias(vec_col),
            F.first("_norm").alias("_norm"),
        )
        .select(
            F.col(id_col), F.col(vec_col), "_norm", (-F.col("_m")["ncid"]).alias("cell")
        )
    )


def norm_health(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding-batch health: vector count, near-zero-norm
    count (norm < 1e-6), non-finite count (NaN/Inf components), and
    exact-quantized norm min/max/sum (floor(norm x 1e6); the left-fold
    dot and IEEE sqrt are bit-identical cross-engine so the floor has no
    tie mode; non-finite rows take the -1 sentinel so NaN never reaches
    the floor/cast). One scan, one combinable groupBy — all state is
    integers."""
    inf = F.lit(float("inf"))
    bad_any = F.exists(vec_col, lambda x: F.isnan(x) | (F.abs(x) == inf))
    nrm = F.expr(_sql_norm(_q(vec_col)))
    per = vectors.select(
        F.col(label_col).alias("label"),
        bad_any.cast("int").alias("bad"),
        F.when(bad_any, F.lit(-1))
        .otherwise(F.floor(nrm * F.lit(1000000.0)).cast("bigint"))
        .alias("norm_u"),
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum((F.col("norm_u") == 0).cast("int")).cast("bigint").alias(
            "n_zero_norm"
        ),
        F.sum("bad").cast("bigint").alias("n_nonfinite"),
        F.min("norm_u").alias("min_norm_u"),
        F.max("norm_u").alias("max_norm_u"),
        F.sum("norm_u").cast("bigint").alias("sum_norm_u"),
    )


def label_margin(
    vectors: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid-margin rollup: for every vector, the cosine to
    its OWN label's centroid minus the best cosine to any OTHER label's
    centroid; reported per label as the count and share of
    positive-margin members — the silhouette-lite separability audit run
    before trusting labels for purity/eval metrics (a label whose
    members mostly sit closer to a foreign centroid is mislabeled or the
    encoder can't see the distinction).

    Exactness: components quantize once (floor(v x 1e6) -> DECIMAL;
    inputs are bounded |v| < 1e4 and the bound is asserted loudly, see
    below); the
    centroid sums, the query-centroid dots (a zip_with product fold with
    a DECIMAL(38,0) accumulator), and both norm squares are exact
    integers — cosine is one final IEEE chain, so margins compare
    identically cross-engine. Cosine's scale invariance absorbs both the
    quantization scale and the 1/n centroid division.

    Scale shape: centroid sums are one scan-side posexplode into a
    combinable groupBy(label, dim) -> |labels| x dim rows, read ONCE by
    the single cents aggregate (array rebuild + norm in one groupBy, so
    no persist is needed — no fork exists); the |labels|-row
    centroid-array table broadcasts into the corpus scan, dots fold
    row-side with no shuffle, and the per-vector max-over-labels
    collapses map-side (the broadcast join emits a vector's |labels|
    rows inside one partition) before the final combinable
    groupBy(label)."""
    q10 = lambda c: F.floor(c.cast("double") * F.lit(1000000.0)).cast(  # noqa: E731
        "decimal(10,0)"
    )
    # Input-bound guard: |v| >= 1e4 overflows the DECIMAL(10,0) quantize —
    # Spark (non-ANSI) would silently null it while DuckDB raises, so
    # pathological embeddings would diverge cross-engine instead of
    # failing loudly. assert_true is evaluated as THE when-condition (not
    # a prunable side column), so a violating row raises in both engines.
    _in_bound = F.assert_true(
        F.coalesce(
            F.array_max(
                F.transform(F.col(vec_col), lambda v: F.abs(v.cast("double")))
            ),
            F.lit(0.0),
        )
        < F.lit(10000.0),
        F.lit(
            "label_margin: embedding component magnitude >= 1e4 overflows "
            "the DECIMAL(10,0) quantization ladder; rescale the embeddings"
        ),
    ).isNull()
    xq = F.when(_in_bound, F.transform(F.col(vec_col), q10))
    xnorm2 = F.aggregate(
        F.transform(xq, lambda a: (a * a).cast("decimal(21,0)")),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, v: acc + v,
    )
    base = vectors.select(
        F.col(id_col),
        F.col(label_col).alias("own_label"),
        xq.alias("_xq"),
        xnorm2.alias("_xn2"),
    ).where(F.col("_xn2") > 0)

    comp = vectors.select(
        F.col(label_col).alias("c_label"),
        F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    ).select(
        "c_label", "dim", q10(F.col("_v")).cast("decimal(18,0)").alias("_vq")
    )
    sums = comp.groupBy("c_label", "dim").agg(
        F.sum("_vq").cast("decimal(18,0)").alias("s")
    )
    cents = sums.groupBy("c_label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s"))),
            lambda st: st["s"],
        ).alias("c_arr"),
        F.sum((F.col("s") * F.col("s")).cast("decimal(37,0)")).alias("_cn2"),
    )

    dot_q = F.aggregate(
        F.zip_with(
            F.col("_xq"),
            F.col("c_arr"),
            lambda a, b: (a * b).cast("decimal(29,0)"),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, v: acc + v,
    )
    cos_q = dot_q.cast("double") / (
        F.sqrt(F.col("_xn2").cast("double")) * F.sqrt(F.col("_cn2").cast("double"))
    )
    scored = base.join(F.broadcast(cents), how="cross").select(
        F.col(id_col),
        "own_label",
        "c_label",
        cos_q.alias("_cos"),
    )
    per_vec = scored.groupBy(id_col, "own_label").agg(
        F.max(F.when(F.col("c_label") == F.col("own_label"), F.col("_cos"))).alias(
            "_own"
        ),
        F.max(F.when(F.col("c_label") != F.col("own_label"), F.col("_cos"))).alias(
            "_other"
        ),
    )
    pos = (F.col("_own") > F.col("_other")).cast("int")
    out = (
        per_vec.where(F.col("_other").isNotNull())
        .groupBy(F.col("own_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(pos).cast("bigint").alias("n_positive_margin"),
            (F.sum(pos).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "margin_share"
            ),
        )
    )
    return out


def knn_graph(
    vectors: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    max_cell: int = 1024,
    salt: int = 8,
    assign: str = "literal",
) -> DataFrame:
    """All-vectors kNN graph restricted to IVF cells (nprobe=1): every
    vector is a query AND a candidate, so unlike :func:`ivf_topk` nothing
    is broadcast — both sides carry the literal-centroid argmax cell as a
    pure projection and meet in ONE hash-partitioned equi-join.

    The candidate side is capped at ``max_cell`` sorted ids per cell (the
    ``DEFAULT_MAX_BUCKET_SIZE`` convention, oracle-mirrored via
    ``rn <= max_cell``), bounding a degenerate hot cell's fan-out at
    |cell| x max_cell instead of |cell|^2; the query side is never
    dropped, so every vector still receives k neighbours. Per-query top-k
    compiles to WindowGroupLimit.

    A bare join on ``cell`` has only |cells| distinct keys, so with few
    cells the corpus-sized query side funnels through |cells| tasks (the
    measured 30x stress knee). Since the CAPPED candidate side is tiny
    (<= max_cell rows per cell), the classic skew remedy applies at no
    cost: replicate candidates across ``salt`` shards and salt the query
    side by id, joining on (cell, salt) — identical pairs (each query
    meets each candidate exactly once, at the query's salt), |cells| x
    ``salt`` join keys.

    Scale notes: the fork into query/candidate sides recomputes the
    assignment projection — two narrow corpus scans, deliberately NOT
    persisted (the projection is scan-bound; caching corpus-sized vectors
    costs more than the second scan). ``n_centroids`` grows with the
    corpus in a production IVF (cells ~ sqrt(n)), keeping the cap
    window's per-cell sort and the join fan-out bounded; the cell id
    doubles as the storage partition key.

    ``assign`` picks the cell-assignment physical strategy — results are
    bit-identical either way: ``"literal"`` (default) bakes centroid
    literals into the projection (no join — best for the declared
    n_centroids=16 class); ``"join"`` broadcasts the centroid TABLE
    (:func:`ivf_cell_assignments_join`) — the production path when cells
    grow ~sqrt(n) with the corpus, where a k~hundreds literal tree would
    degrade codegen. With growing cells the join-key count
    |cells| x salt grows with the corpus, lifting the fixed-key
    parallelism cap the 100x stress row measured (VERDICT r5 item 4).

    Returns (query_id, candidate_id, cosine, rank).
    """
    if assign == "join":
        if centroids is not None:
            raise ValueError("assign='join' uses the id-prefix centroid table")
        assigned = ivf_cell_assignments_join(vectors, n_centroids, id_col, vec_col)
    else:
        cents, cnorms = _resolve_centroids(
            vectors, n_centroids, id_col, vec_col, centroids
        )
        assigned = (
            vectors.select(
                F.col(id_col), F.col(vec_col), F.expr(_sql_norm(_q(vec_col))).alias("_norm")
            )
            # zero-norm vectors have no defined cosine (NaN would silently
            # poison every rank they touch): exclude them from the graph —
            # they surface downstream as in-degree-0 rows in hubness QC
            # (oracle-mirrored in _HUBNESS_ORACLE's live CTE)
            .where(F.col("_norm") > 0)
            .withColumn(
                "_cells", _cell_structs(_q(vec_col), "`_norm`", cents, cnorms)
            )
            .select(
                F.col(id_col),
                F.col(vec_col),
                "_norm",
                (-F.array_max("_cells")["ncid"]).alias("cell"),
            )
        )
    wcap = Window.partitionBy("cell").orderBy(id_col)
    cand = (
        assigned.withColumn("_rn", F.row_number().over(wcap))
        .where(F.col("_rn") <= max_cell)
        .select(
            F.col(id_col).alias("candidate_id"),
            F.col(vec_col).alias("c_vec"),
            F.col("_norm").alias("c_norm"),
            "cell",
            F.explode(
                F.array(*[F.lit(i) for i in range(salt)])
            ).alias("_salt"),
        )
    )
    # salt on the id's HASH, not the raw id: any id type works (a string
    # doc_id would fail pmod analysis with an opaque error) and routing
    # stays uniform for strided ids. Routing only — each query still
    # meets each candidate exactly once (candidates replicate across all
    # salts), so the output is identical for any salt function.
    q = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
        "cell",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).cast("int").alias("_salt"),
    )
    scored = (
        q.join(cand, ["cell", "_salt"])
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            F.expr(
                f"({_sql_dot('`q_vec`', '`c_vec`')}) / (`q_norm` * `c_norm`)"
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def semantic_dedup_drops(
    vectors: DataFrame,
    threshold: float = 0.3,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    max_bucket_size: int | None = None,
    assign: str = "literal",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster-scoped embedding dedup.

    Assign every vector to its nearest-centroid cell — the identical
    pure-projection argmax :func:`ivf_topk` uses (literal centroids, no
    corpus shuffle or join for assignment) — then generate pairs only
    WITHIN a cell, verify exact cosine >= ``threshold``, and drop the
    larger id of each verified pair (smallest near-dup reported as the
    keeper). The data-DEPENDENT counterpart of the data-oblivious
    sign-bucket :func:`embedding_near_dup_drops`: cells follow corpus
    density, so semantically-close pairs co-bucket at much higher recall
    for the same candidate budget.

    Scale: only same-cell pairs ever meet (the hot-bucket cap bounds a
    degenerate cell at cap^2/2 candidates, deterministically — first
    ``max_bucket_size`` ids); verification is exact cosine on candidates
    only. ``centroids=`` takes :func:`ivf_fit_centroids` output in
    production; the id-prefix stand-in keeps the oracle SQL-expressible.
    ``assign="join"`` switches assignment to the broadcast centroid-table
    strategy (:func:`ivf_cell_assignments_join`, bit-identical) for
    cells ~ sqrt(n) configurations where a literal tree would degrade —
    with growing cells the per-cell population stays ~sqrt(n), so the
    capped in-cell pair generation keeps its budget as the corpus grows.
    """
    from mdio_python_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        bucket_pairs,
    )

    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET_SIZE
    if assign == "join":
        if centroids is not None:
            raise ValueError("assign='join' uses the id-prefix centroid table")
        keyed = ivf_cell_assignments_join(
            vectors, n_centroids, id_col=id_col, vec_col=vec_col
        ).select(F.col(id_col).alias("doc_id"), "cell")
    else:
        keyed = ivf_cell_assignments(
            vectors, n_centroids, id_col=id_col, vec_col=vec_col,
            centroids=centroids,
        ).select(F.col(id_col).alias("doc_id"), "cell")
    pairs = (
        bucket_pairs(keyed, ["cell"], max_bucket_size=max_bucket_size)
        .withColumnRenamed("doc_a", "vec_a")
        .withColumnRenamed("doc_b", "vec_b")
    )
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"))
    verified = (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.expr(_sql_cosine("`a_vec`", "`b_vec`")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    return verified.groupBy(F.col("vec_b").alias("drop_id")).agg(
        F.min("vec_a").alias("keep_id"),
        F.count(F.lit(1)).alias("n_near_dups"),
    )


# --- Product quantization (Jegou et al., TPAMI 2011 — the PQ part) ---------


def l2sq(a: Column, b: Column) -> Column:
    """Left-fold squared L2 distance: deterministic evaluation order
    matching the oracle's list_reduce fold bit-for-bit."""
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    sq = F.zip_with(diffs, diffs, lambda x, y: x * y)
    return F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v)


def _py_l2sq(a, b) -> float:
    """Python twin of :func:`l2sq` with the identical left fold, for
    plan-build-time constants (ADC lookup tables)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += (float(x) - float(y)) * (float(x) - float(y))
    return acc


def pq_codebooks(
    candidates: DataFrame,
    n_subspaces: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], int]:
    """Deterministic PQ codebooks: the subvectors of the id-prefix rows
    (oracle-expressible stand-in for per-subspace sampled k-means — at
    real scale you'd fit codebooks on a driver-side sample; the plan
    shape downstream is identical). Returns (codebooks[m][k] -> subvector,
    subspace_dim)."""
    rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in candidates.where(F.col(id_col) < n_codes)
        .select(id_col, vec_col)
        .collect()
    )
    if len(rows) < n_codes:
        raise ValueError(
            f"codebook prefix has {len(rows)} rows with {id_col} < "
            f"{n_codes}; need {n_codes} (codes are POSITIONS in this "
            "sorted prefix — oracles must rank the same way)"
        )
    dim = len(rows[0][1])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    sub = dim // n_subspaces
    books = [
        [vec[m * sub : (m + 1) * sub] for _, vec in rows]
        for m in range(n_subspaces)
    ]
    return books, sub


def fit_pq_codebooks(
    candidates: DataFrame,
    n_subspaces: int = 4,
    n_codes: int = 8,
    iters: int = 3,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], int]:
    """Production PQ training path (vs :func:`pq_codebooks`' id-prefix
    test stand-in): per-subspace Lloyd k-means with **squared-L2**
    assignment — the metric PQ encode/ADC scoring use — on a deterministic
    hash sample.

    The subspace fits are mathematically independent (Jegou et al.
    §III.A), but running them as independent JOBS is the slow shape: it
    costs ``n_subspaces * (1 + iters)`` sequential driver round-trips and
    as many whole-stage-codegen compiles. All subspaces train in lockstep
    instead — ONE init collect (the same k lowest-id sample rows seed
    every subspace, sliced driver-side) and ONE job per Lloyd iteration
    that assigns + explodes + means every subspace together — so driver
    traffic is ``1 + iters`` round-trips of ``M x k x sub_dim`` floats
    total (measured 12.6 s -> ~4 s on the declared fit query). Output is
    bit-identical to the per-subspace loop: each (subspace, cluster, dim)
    group sums exactly the same values through the order-independent
    exact-decimal mean, and assignment evaluates the same fold per
    subspace — pinned by the pure-Python mirror AND the committed
    canonical-artifact test in tests/test_model_store.py."""
    from mdio_python_spark.functions.determinism import dsum

    sample = hash_sample(candidates, sample_mod or 1, id_col)

    # ONE init job: kmeans_fit's init per subspace is the k lowest-id
    # rows of that subspace's slice — the same k sample rows for every
    # subspace, so collect once and slice on the driver (the dim check
    # reads the first init row instead of spending a separate job).
    init = (
        sample.select(id_col, vec_col).orderBy(F.col(id_col)).limit(n_codes).collect()
    )
    if len(init) < n_codes:
        raise ValueError(
            f"need >= {n_codes} vectors to init k-means, got {len(init)}"
        )
    dim = len(init[0][1])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    sub = dim // n_subspaces
    books = [
        [[float(x) for x in r[1][m * sub : (m + 1) * sub]] for r in init]
        for m in range(n_subspaces)
    ]

    for _ in range(iters):
        # one combined Lloyd step: per subspace, l2-argmin assignment
        # (ties to the lowest code — same struct array_min as
        # kmeans.assign_clusters) packaged as (m, cluster, subvec),
        # exploded once, then ONE combinable groupBy over
        # (m, cluster, dim) exact-decimal means.
        # the whole per-subspace struct array builds as ONE F.expr (the
        # round-10 SQL-builder rule: Column-API literal codebooks cost
        # ~50 ms py4j per fold — 32 folds per iteration here)
        branches = []
        for m, cb in enumerate(books):
            sv = f"slice({_q(vec_col)}, {m * sub + 1}, {sub})"
            codes = ",".join(
                "named_struct('d', {d}, 'cid', CAST({k} AS BIGINT))".format(
                    d=_sql_l2sq(sv, _sql_vec(c)), k=k
                )
                for k, c in enumerate(cb)
            )
            branches.append(
                f"named_struct('m', {m}, "
                f"'cluster', array_min(array({codes})).cid, "
                f"'sv', {sv})"
            )
        rows = (
            sample.select(
                F.explode(F.expr("array(" + ",".join(branches) + ")")).alias("s")
            )
            .select("s.m", "s.cluster", F.posexplode("s.sv").alias("dim", "val"))
            .groupBy("m", "cluster", "dim")
            .agg(
                (
                    dsum(F.col("val").cast("double"), 8)
                    / F.count(F.lit(1)).cast("double")
                ).alias("centroid")
            )
            .collect()
        )
        by: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            by.setdefault((int(r["m"]), int(r["cluster"])), {})[int(r["dim"])] = (
                float(r["centroid"])
            )
        books = [
            [
                [new[d] for d in sorted(new)]
                if (new := by.get((m, k))) is not None
                else books[m][k]
                for k in range(n_codes)
            ]
            for m in range(n_subspaces)
        ]
    return books, sub


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding as a pure projection: per subspace, argmin squared-L2
    against the literal codebook via ``array_min`` over (dist, code)
    structs — no join, no shuffle, the corpus is scanned once. A
    64-dim float32 vector compresses to ``n_subspaces`` small ints
    (with 8 codes: 4 x 3 bits vs 256 bytes — the memory ratio that makes
    billion-vector ANN fit a cluster's RAM at 100 TB)."""
    out = df
    for m, cb in enumerate(codebooks):
        sv = f"slice({_q(vec_col)}, {m * sub_dim + 1}, {sub_dim})"
        codes = ",".join(
            "named_struct('d', {d}, 'k', CAST({k} AS BIGINT))".format(
                d=_sql_l2sq(sv, _sql_vec(c)), k=k
            )
            for k, c in enumerate(cb)
        )
        out = out.withColumn(
            f"code_{m}", F.expr(f"array_min(array({codes})).k")
        )
    return out


def pq_adc_distance(
    df_codes: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    sub_dim: int,
) -> Column:
    """Asymmetric-distance (ADC) lookup for a fixed query: per subspace,
    the query-to-codeword distances are plan-build-time literal tables
    (computed once in Python with the same left fold both engines use),
    so the per-row cost is ``n_subspaces`` array lookups + adds — the
    O(1)-per-candidate scoring that replaces a 64-dim dot product."""
    total = None
    for m, cb in enumerate(codebooks):
        q_sub = query_vec[m * sub_dim : (m + 1) * sub_dim]
        table = [_py_l2sq(q_sub, c) for c in cb]
        term = F.element_at(
            F.array(*[F.lit(v) for v in table]),
            (F.col(f"code_{m}") + 1).cast("int"),
        )
        total = term if total is None else total + term
    return total


def ivfpq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: tuple[list[list[list[float]]], int] | None = None,
    arrow: bool = True,
) -> DataFrame:
    """IVF-PQ ANN (Jegou et al. TPAMI 2011, the full system): coarse
    Voronoi cells bound WHICH candidates a query scores, PQ codes bound
    WHAT crosses the join — the shape billion-vector search actually
    deploys, composed from :func:`ivf_topk`'s assignment and
    :func:`pq_encode`/ADC.

    Scale design: the candidate side carries (id, cell, M codes) — the
    raw vector never crosses the probe join, so the shuffled bytes per
    candidate drop from dim x 4 to ~M+12. Cell assignment and PQ encode
    are both literal-table projections (no shuffle); each query row
    precomputes its M x K ADC lookup tables ONCE (query side is tiny and
    broadcast), so scoring a candidate is M ``element_at`` adds. The one
    shuffle is the final per-query top-k. Distances are left-fold doubles
    end-to-end — bit-equal to the DuckDB oracle's ``list_reduce`` folds.

    ``centroids``/``codebooks`` take the production fitted literals
    (:func:`ivf_fit_centroids` / :func:`fit_pq_codebooks`); defaults are
    the deterministic id-prefix stand-ins so the full plan stays
    SQL-expressible for the oracle.
    """
    if codebooks is None:
        books, sub = pq_codebooks(candidates, n_subspaces, n_codes, id_col, vec_col)
    else:
        books, sub = codebooks
    cents, cnorms = _resolve_centroids(
        candidates, n_centroids, id_col, vec_col, centroids
    )
    if arrow:
        # round 10: cell assignment, PQ encode, and the ADC scoring run
        # in one vectorized Arrow map pass over the corpus
        # (vector_arrow.ivfpq_local_topk, bit-identical doubles); one
        # bounded JVM window assigns the global ranks. The query sample
        # is collected at construction — consumers are eager.
        from mdio_python_spark.operators.vector_arrow import ivfpq_local_topk

        local = ivfpq_local_topk(
            queries,
            candidates,
            k=k,
            centroids=cents,
            codebooks=books,
            sub_dim=sub,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
        )
        w_rank = Window.partitionBy("query_id").orderBy(
            "adc_dist", "candidate_id"
        )
        return (
            local.withColumn("rank", F.row_number().over(w_rank))
            .where(F.col("rank") <= k)
            .select("query_id", "candidate_id", "cell", "adc_dist", "rank")
        )

    # argmax via array_max over (cos, -cid) structs, as in ivf_topk
    c = (
        candidates.select(
            F.col(id_col).alias("candidate_id"),
            F.col(vec_col),
            F.expr(_sql_norm(_q(vec_col))).alias("_n"),
        )
        .withColumn(
            "_cells", _cell_structs(_q(vec_col), "`_n`", cents, cnorms)
        )
        .withColumn("cell", -F.array_max("_cells")["ncid"])
        .drop("_cells", "_n")
    )
    c = pq_encode(c, books, sub, id_col="candidate_id", vec_col=vec_col).select(
        "candidate_id", "cell", *[f"code_{m}" for m in range(len(books))]
    )
    # per-query ADC tables (K distances per subspace) are projected
    # BEFORE the probe explode so each table is computed once per query
    # row, not once per probe; scoring a candidate is M element_at adds
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_q_vec"),
        F.expr(_sql_norm(_q(vec_col))).alias("_qn"),
    ).withColumn(
        "_cells", _cell_structs("`_q_vec`", "`_qn`", cents, cnorms)
    )
    for m, cb in enumerate(books):
        q_sub = f"slice(`_q_vec`, {m * sub + 1}, {sub})"
        q = q.withColumn(
            f"_tab_{m}",
            F.expr(
                "array("
                + ",".join(_sql_l2sq(q_sub, _sql_vec(cw)) for cw in cb)
                + ")"
            ),
        )
    q = (
        q.select(
            "query_id",
            *[f"_tab_{m}" for m in range(len(books))],
            F.explode(
                F.slice(F.sort_array("_cells", asc=False), 1, nprobe)
            ).alias("_p"),
        )
        .withColumn("cell", -F.col("_p")["ncid"])
        .drop("_p")
    )
    adc = None
    for m in range(len(books)):
        term = F.element_at(
            F.col(f"_tab_{m}"), (F.col(f"code_{m}") + 1).cast("int")
        )
        adc = term if adc is None else adc + term
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select("query_id", "candidate_id", "cell", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "candidate_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cell", "adc_dist", "rank")
    )


def rp_signs(out_dim: int, in_dim: int, salt: str = "rp") -> list[list[float]]:
    """Deterministic Rademacher (+/-1) projection matrix, derived from the
    same md5-based hash convention as :func:`functions.scalars.hash64` so
    the matrix is reproducible from its spec alone (no RNG state): entry
    (j, k) is +1 iff the low bit of md5("{salt}_{j}_{k}") is even."""
    import hashlib

    def sgn(j: int, k: int) -> float:
        h = int(hashlib.md5(f"{salt}_{j}_{k}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [[sgn(j, k) for k in range(in_dim)] for j in range(out_dim)]


def random_project(
    df: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    vec_col: str = "embedding",
    salt: str = "rp",
    scale: bool = True,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction by a literal
    Rademacher matrix: ``rp_j = (1/sqrt(out_dim)) * sum_k sign[j][k] *
    vec[k]`` (Achlioptas 2003 database-friendly projections — +/-1
    entries need no float matrix and preserve pairwise distances in
    expectation).

    Scale shape: a pure projection — the matrix is ``out_dim x in_dim``
    plan literals, each output is one left-fold over the input array, no
    shuffle and no Python. The standard pre-step that makes downstream
    ANN (sign buckets, IVF cells) cheaper by in_dim/out_dim. The left
    fold's evaluation order is the cross-engine determinism contract
    (same as :func:`l2sq`); ``1/sqrt(out_dim)`` is a single exact-input
    sqrt, correctly rounded identically in the JVM and DuckDB.
    """
    signs = rp_signs(out_dim, in_dim, salt)
    cols = {}
    for j in range(out_dim):
        acc = F.expr(
            f"aggregate(zip_with({_q(vec_col)}, {_sql_vec(signs[j])}, "
            f"(x, s) -> CAST(x AS DOUBLE) * s), 0.0D, (acc, v) -> acc + v)"
        )
        if scale:
            acc = acc / F.sqrt(F.lit(float(out_dim)))
        cols[f"rp_{j}"] = acc
    return df.withColumns(cols)


def sql_random_project(
    out_dim: int = 8,
    in_dim: int = 64,
    vec_col: str = "embedding",
    salt: str = "rp",
    scale: bool = True,
) -> list[str]:
    """DuckDB fragments matching :func:`random_project` bit-for-bit: one
    left-associated chain per output dim (SQL ``+`` parses left-assoc, the
    same order as the Spark fold), starting from the fold's 0.0 seed."""
    signs = rp_signs(out_dim, in_dim, salt)
    frags = []
    for j in range(out_dim):
        chain = "0.0"
        for k in range(in_dim):
            s = "1.0" if signs[j][k] > 0 else "-1.0"
            chain += f" + CAST({vec_col}[{k + 1}] AS DOUBLE) * {s}"
        if scale:
            chain = f"({chain}) / sqrt({float(out_dim)})"
        frags.append(chain)
    return frags


def source_centroid_cosine(
    docs: DataFrame,
    emb: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine similarity between per-group embedding centroids —
    the source-level semantic-similarity matrix (which crawls cover the
    same content?) that complements the token-level
    ``source_vocab_overlap`` signal.

    Exactness: cosine is scale-invariant, so the centroid's 1/n division
    never happens — the cosine of the SUM vectors is the cosine of the
    means — and the same invariance absorbs the quantization scale:
    components quantize once via ``floor(v * 1e6)`` (float->double
    widening is exact, the double multiply and floor are IEEE-identical
    in both engines, and floor — unlike any rounding — has no tie mode
    to disagree on; engines' float->DECIMAL casts measurably diverge at
    the 7th decimal). Every sum/product then stays in exact decimal:
    per-dim sums in DECIMAL(18,0) (fits 1e12 rows per group at |v| < 1),
    pairwise products in DECIMAL(37,0) (18+18+1 = 37 <= 38, never the
    silent scale-reduction trap), dim-summed dots in DECIMAL(38,0). The
    final cosine is one fixed IEEE chain (decimal->double casts are
    correctly rounded in both engines; sqrt is IEEE-exact).

    Scale shape: one corpus-sized posexplode projection (scan-side,
    dim x rows) feeding one combinable groupBy(group, dim) that collapses
    to |groups| x dim rows; that tiny stage is PERSISTED because four
    consumers read it (both self-join sides and both norm tables —
    planner ReusedExchange does not fire across self-join re-aliasing,
    so without the persist the corpus explode would run four times).
    Everything downstream is dimension-table sized (dim-keyed self-join
    bounded at |groups|^2 x dim rows, broadcast norm joins).
    """
    from pyspark import StorageLevel

    from mdio_python_spark.operators.caching import attach_cached, rotate_scoped

    j = docs.select(F.col(id_col).alias(vec_id_col), group_col).join(
        emb, vec_id_col
    )
    comp = j.select(
        group_col, F.posexplode(F.col(vec_col)).alias("dim", "_v")
    ).select(
        group_col,
        "dim",
        F.floor(F.col("_v").cast("double") * F.lit(1000000.0))
        .cast("decimal(18,0)")
        .alias("_vq"),
    )
    sums = (
        comp.groupBy(group_col, "dim")
        .agg(F.sum("_vq").cast("decimal(18,0)").alias("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prod = (F.col("sa") * F.col("sb")).cast("decimal(37,0)")
    a = sums.select(
        F.col(group_col).alias("group_a"), "dim", F.col("s").alias("sa")
    )
    b = sums.select(
        F.col(group_col).alias("group_b"), "dim", F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "dim")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.sum(prod).alias("dot"))
    )
    sq = (F.col("s") * F.col("s")).cast("decimal(37,0)")
    norms = sums.groupBy(group_col).agg(F.sum(sq).alias("n2"))
    na = norms.select(F.col(group_col).alias("group_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col(group_col).alias("group_b"), F.col("n2").alias("n2b"))
    out = (
        dots.join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .where((F.col("n2a") > 0) & (F.col("n2b") > 0))
        .select(
            "group_a",
            "group_b",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2a").cast("double"))
                    * F.sqrt(F.col("n2b").cast("double"))
                )
            ).alias("centroid_cosine"),
        )
    )
    rotate_scoped("similarity.source_centroid_cosine", sums)
    return attach_cached(out, sums)
