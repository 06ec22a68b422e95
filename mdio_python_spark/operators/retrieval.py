"""Lexical retrieval over the document corpus: BM25-family relevance
scoring and term statistics.

Beyond-reference surface (BASELINE.json north star): the lexical
counterpart of the embedding ANN operators in ``similarity.py`` — every
large-scale training-data pipeline needs "find documents matching these
terms" both for curation (targeted subset extraction) and for building
retrieval baselines.

Scale design (the 100 TB shape):
- For a FIXED query term set (the common case: k query terms, k small)
  per-term frequencies are computed as pure Column expressions over the
  token array — **no corpus explode, no shuffle**; the corpus is scanned,
  each row emits k tf counts.
- Corpus statistics (N, total token count, per-term document frequency)
  are ONE combinable global aggregate producing a single row, attached
  back via a broadcast nested-loop join of that 1-row table (the only
  join in the plan, build side = 1 row).
- The final top-k ranks the scored table with a window ordered by
  (score desc, doc_id) — the input to the sort is the corpus, so the
  plan filters score > 0 first: only docs containing at least one query
  term reach the sort (for selective queries this is a tiny fraction).

Determinism: the classic BM25 idf uses ``ln`` — a transcendental that
libm (DuckDB) and the JVM (Spark) may round differently. We use the
monotone pre-log Robertson idf ``(N - df + 0.5) / (df + 0.5)`` instead:
per-term document ranking is unchanged (the transform is monotone in
df), and the whole score is rational arithmetic — IEEE +,-,*,/ are
correctly rounded in both engines, so scores hash-match bit-for-bit as
long as the oracle mirrors the exact expression tree (association
order included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mdio_python_spark.operators.text import tokens

K1 = 1.2
B = 0.75


def _toks(text_col: str):
    # the ONE shared tokenization (operators.text.tokens, mirrored by
    # plans.llm_queries._TOKS) — oracle hash parity depends on it
    return tokens(F.lower(F.col(text_col)))


def _eq(term: str):
    # single-arg closure: a 2-arg lambda would make pyspark pass the
    # array index as the second argument
    return lambda x: x == F.lit(term)


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against ``terms`` with rational-idf BM25.

    Returns (id_col, score) for documents matching >= 1 term.
    """
    if not terms:
        raise ValueError("empty query term set")
    toks = _toks(text_col)
    tf_cols = {
        f"_tf{i}": F.size(F.filter(toks, _eq(t))).cast("long")
        for i, t in enumerate(terms)
    }
    per_doc = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("_dl"),
        *[c.alias(n) for n, c in tf_cols.items()],
    )

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    scored = per_doc.join(F.broadcast(stats))
    # dl/avgdl as dl * N / sum_dl; constants and association order mirrored
    # exactly in the SQL oracle (see plans.llm_queries).
    norm = F.lit(1.0 - B) + F.lit(B) * F.col("_dl") * F.col("_n_docs") / F.col(
        "_sum_dl"
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        idf = (F.col("_n_docs") - F.col(f"_df{i}") + F.lit(0.5)) / (
            F.col(f"_df{i}") + F.lit(0.5)
        )
        term_score = F.when(
            tf > 0,
            idf * ((tf * F.lit(K1 + 1.0)) / (tf + F.lit(K1) * norm)),
        ).otherwise(F.lit(0.0))
        score = term_score if score is None else score + term_score
    return (
        scored.withColumn("score", score)
        .where(F.col("score") > 0)
        .select(id_col, "score")
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 retrieval: (id, score, rank), rank 1 = best.

    Two-phase top-k so no corpus-sized set ever reaches a single task
    (for common query terms "matching docs" can be most of the corpus):
    phase 1 ranks within 64 deterministic hash buckets of the id (a
    partitioned window — parallel) and keeps k per bucket; phase 2 ranks
    the ≤ 64k survivors globally. Ties break on id, so the result is
    identical to a direct global top-k and to the single-window SQL
    oracle.
    """
    from mdio_python_spark.functions.scalars import hash64

    scored = bm25_scores(df, terms, id_col=id_col, text_col=text_col)
    bucket = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(64))
    w_local = Window.partitionBy(bucket).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    pruned = scored.withColumn("_lrank", F.row_number().over(w_local)).where(
        F.col("_lrank") <= k
    )
    from mdio_python_spark.operators.ranking import constant_partition

    # deliberate single partition over the <= 64k survivors
    w = Window.partitionBy(constant_partition(id_col)).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )


def term_stats(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term corpus statistics (collection frequency + document
    frequency) for a fixed vocabulary — one combinable aggregate, output
    one row per term via a literal-array explode of the k aggregated
    columns (never an explode of the corpus)."""
    toks = _toks(text_col)
    per_doc = df.select(
        *[
            F.size(F.filter(toks, _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ]
    )
    agg = per_doc.agg(
        *[F.sum(f"_tf{i}").alias(f"_cf{i}") for i in range(len(terms))],
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.col(f"_cf{i}").alias("collection_freq"),
                F.col(f"_df{i}").alias("doc_freq"),
            )
            for i, t in enumerate(terms)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.term", "r.collection_freq", "r.doc_freq"
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_a_col: str = "rank_lex",
    rank_b_col: str = "rank_vec",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack et al. 2009):
    ``score = sum 1/(c + rank)`` over the lists an id appears in, top-k
    by fused score. The standard hybrid-search combiner — rank-based, so
    BM25 and cosine scores never need calibration against each other.

    Scale shape: the inputs are top-N lists (N ~ tens), so the full
    outer join and the final sort are broadcast-trivial regardless of
    corpus size — all corpus-sized work happened inside the upstream
    retrievers. Pure rational arithmetic (1/(c+rank)), bit-stable
    cross-engine.
    """
    a = ranked_a.select(id_col, F.col("rank").alias(rank_a_col))
    b = ranked_b.select(id_col, F.col("rank").alias(rank_b_col))
    one = F.lit(1.0)
    fused = (
        a.join(b, id_col, "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(
                one / (F.lit(c) + F.col(rank_a_col)).cast("double"), F.lit(0.0)
            )
            + F.coalesce(
                one / (F.lit(c) + F.col(rank_b_col)).cast("double"), F.lit(0.0)
            ),
        )
    )
    from mdio_python_spark.operators.ranking import constant_partition

    # deliberate single partition over the fused top-N lists
    w = Window.partitionBy(constant_partition(id_col)).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, rank_a_col, rank_b_col, "rrf_score", "rank")
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tie_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k rows per group by ``order_col`` descending, ties broken
    on ``tie_col`` ascending — the generalization of :func:`bm25_topk`'s
    two-phase shape to arbitrary grouped rankings (top n-grams per
    language, top documents per source, ...).

    Two-phase so no unbounded set reaches a single task even when one
    group dominates (per-group row counts are corpus-scale for skewed
    groups like languages): phase 1 ranks within (group, 64 hash buckets
    of the tie key) — a fully parallel partitioned window — and keeps k
    per bucket; phase 2 ranks the <= 64k survivors per group. Any global
    top-k row is top-k within its bucket, so the result is identical to
    the direct single-window form (and to the SQL oracle).
    """
    from mdio_python_spark.functions.scalars import hash64

    bucket = F.pmod(hash64(F.col(tie_col).cast("string")), F.lit(64))
    order = [F.col(order_col).desc(), F.col(tie_col)]
    w_local = Window.partitionBy(*group_cols, bucket).orderBy(*order)
    pruned = df.withColumn("_lrank", F.row_number().over(w_local)).where(
        F.col("_lrank") <= k
    )
    # bounded: <= 64k rows per group survive phase 1
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("_lrank")
    )
