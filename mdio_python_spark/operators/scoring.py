"""Hashed linear model scoring: fasttext-style embedding-bag inference as
a pure DataFrame plan.

The model every large corpus-curation stack runs between heuristics and
expensive neural scoring is a linear classifier over hashed token
features (fastText's architecture): each token hashes into a weight
bucket, the doc score is the mean bucket weight plus a bias, and a
threshold turns it into a keep/drop label. At 100 TB that is the ideal
Spark shape — explode + map-side-combinable groupBy, weights *computed*
from the hash (no join against a weight table; a real deployment would
broadcast-join a few-MB weight array instead, same plan shape otherwise).

Determinism contract: weights are exact integers derived from the shared
md5 ``hash64`` (multiplicative scramble inside int64 range), summed as
BIGINT, with ONE double division at the end — bit-identical in Spark and
the DuckDB oracle with no decimal machinery needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mdio_python_spark.functions.scalars import hash64
from mdio_python_spark.operators.text import tokens

# Weight-table size M (prime) and odd multiplicative scrambler A.
# (M-1)*A < 2^49 keeps every intermediate inside int64 in BOTH engines
# (Java long wraps silently; DuckDB BIGINT errors — neither may overflow).
_M = 100_003
_A = 2_654_435_761
_HALF = (_M - 1) // 2  # centering offset -> weights in [-HALF, +HALF]


def token_weight(token: Column, salt: str = "qw") -> Column:
    """Exact integer weight in [-(M-1)/2, +(M-1)/2] for a token."""
    bucket = F.pmod(hash64(F.concat(F.lit(salt), token)), F.lit(_M))
    scrambled = F.pmod(bucket * F.lit(_A), F.lit(_M))
    return scrambled - F.lit(_HALF)


def sql_token_weight(token_expr: str, salt: str = "qw") -> str:
    """DuckDB fragment matching :func:`token_weight` bit-for-bit."""
    from mdio_python_spark.functions.scalars import sql_hash64

    h = sql_hash64(f"'{salt}' || {token_expr}")
    return f"((({h}) % {_M}) * {_A}) % {_M} - {_HALF}"


def model_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_threshold: float = 0.05,
    review_threshold: float = -0.05,
) -> DataFrame:
    """Score every document with the hashed linear model.

    Returns ``(id_col, n_tokens, weight_sum, score, label)`` where
    ``score = weight_sum / (n_tokens * HALF)`` lies in [-1, 1] and
    ``label`` buckets it into keep/review/drop. The only exchange is the
    combinable per-doc groupBy; the token weights never leave the scan
    stage as anything wider than a long.
    """
    # lowercase fold, as fastText preprocessing does (and the oracle's
    # shared token fragment already lowercases)
    tok = df.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    per_doc = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(token_weight(F.col("token"))).alias("weight_sum"),
    )
    score = F.col("weight_sum").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(float(_HALF))
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "weight_sum",
        score.alias("score"),
        F.when(score >= F.lit(keep_threshold), F.lit("keep"))
        .when(score >= F.lit(review_threshold), F.lit("review"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
