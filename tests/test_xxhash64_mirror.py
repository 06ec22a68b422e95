"""Pin the DuckDB mirror of Spark's xxhash64 (round 7,
functions/scalars.py:sql_xxhash64_ascii16) directly against
F.xxhash64 on adversarial 16-byte ASCII inputs.

The oracle-parity suite already exercises the mirror end-to-end through
winnowing_dup_pairs at sf0.001, but only over corpus k-grams; this test
pins the generator itself on the byte patterns most likely to expose an
arithmetic slip (sign-bit folds, carry chains, rotation boundaries) and
the non-16-byte poison guard.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from mdio_python_spark.functions.scalars import sql_xxhash64_ascii16


def _adversarial_inputs() -> list[str]:
    rng = random.Random(7)
    printable = string.ascii_letters + string.digits + string.punctuation + " "
    fixed = [
        "\x00" * 16,  # NUL bytes (valid 1-byte UTF-8; stresses zero words)
        "\x7f" * 16,  # max-ASCII bytes -> high bits through the lanes
        "\x00" * 15 + "\x7f",
        "\x7f" + "\x00" * 15,
        "abcdefghijklmnop",
        " " * 16,
        "A" * 8 + "\x7f" * 8,
    ]
    randoms = [
        "".join(rng.choice(printable) for _ in range(16)) for _ in range(40)
    ] + [
        "".join(chr(rng.randrange(1, 128)) for _ in range(16)) for _ in range(40)
    ]
    return fixed + randoms


def test_sql_mirror_matches_spark_xxhash64(spark):
    from pyspark.sql import functions as F

    values = _adversarial_inputs()
    got_spark = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in values], ["s"])
        .select(F.xxhash64("s"))
        .collect()
    ]
    # NUL and quote characters can't ride a SQL VALUES literal: route the
    # tricky ones through a parameterized duckdb relation instead
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    inner = "SELECT s, hex(encode(s)) AS hx FROM t"
    by_val = dict(con.sql(f"SELECT s, h FROM {sql_xxhash64_ascii16(inner)}").fetchall())
    got_duck = [by_val[v] for v in values]
    assert got_duck == got_spark


def test_sql_mirror_rejects_non_16_byte_input():
    """The poison guard: anything that isn't exactly 16 bytes must fail
    the hex cast loudly, never hash wrong silently (the non-ASCII /
    wrong-length escape hatch is the md5 contract)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?)",
        [("short",), ("seventeen chars!!",), ("café is not ascii",)],
    )
    inner = "SELECT s, hex(encode(s)) AS hx FROM t"
    with pytest.raises(duckdb.ConversionException):
        con.sql(f"SELECT s, h FROM {sql_xxhash64_ascii16(inner)}").fetchall()
