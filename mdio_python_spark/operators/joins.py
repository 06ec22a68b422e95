"""Join strategy helpers for skewed keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.py`) splits oversized partitions at runtime and is the first
line of defense. Explicit salting still matters when
- the skewed join feeds a downstream op pinned to the same partitioning
  (AQE's split would just re-concentrate at the next stage),
- the build side must be shuffled too (skew-join only splits one side),
- or a deployment runs with AQE off.

``salted_join`` implements the standard recipe: the probe side gets a
deterministic salt in ``[0, salt)``, the build side is exploded
``salt``-ways, and the equi-join runs on ``(keys..., salt)`` — one hot
key now lands on ``salt`` tasks instead of one. Build-side blow-up is
``salt``×, so this is for moderate build sides (dims, per-key stats),
never corpus-vs-corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with key salting to spread hot keys across ``salt`` tasks.

    ``left`` is the large/skewed (probe) side; ``right`` is replicated
    ``salt``-ways. The salt mixes a per-physical-row component
    (``monotonically_increasing_id`` + ``spark_partition_id``) into the
    content hash, so byte-identical duplicate rows of a hot key — the most
    common skew shape — still spread across ``salt`` tasks. It stays
    deterministic per physical row within a job run (mid-ids are stable
    under task retry because Spark recomputes the same partition with the
    same partition index and row order). Map-typed columns are excluded
    from the content hash (``F.hash`` rejects maps). Result equals the
    unsalted ``left.join(right, on, how)`` for inner/left joins.
    """
    if salt < 2:
        raise ValueError("salt must be >= 2")
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if SALT_COL in left.columns or SALT_COL in right.columns:
        # withColumn would silently REPLACE a user column of this name and
        # the final drop would lose it from the result
        raise ValueError(
            f"input already has a {SALT_COL!r} column; rename it first"
        )
    keys = [on] if isinstance(on, str) else list(on)

    def _has_map(dt) -> bool:
        # F.hash rejects MapType anywhere in the tree (top-level, inside
        # arrays, struct fields) — a prefix check on the dtype string
        # missed nested maps and crashed at plan time
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    hashable = [
        f.name for f in left.schema.fields if not _has_map(f.dataType)
    ] or keys
    probe = left.withColumn(
        SALT_COL,
        F.pmod(
            F.hash(
                F.struct(*hashable),
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(salt),
        ),
    )
    build = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return probe.join(build, [*keys, SALT_COL], how).drop(SALT_COL)
