"""Arrow-batched winnowing fingerprint selection.

The declarative :func:`operators.text.winnow_fingerprint_set` builds an
O(chars) posexplode of per-position k-gram hashes, a per-doc window min,
and a distinct — three corpus-sized stages whose row-materialization
cost made ``winnowing_dup_pairs`` the top absolute 100x stress row
(273.6 s; VERDICT r7 item 4 — r7 already proved the HASH was not the
bottleneck, the explode + window were). This module computes the
IDENTICAL fingerprint set per document inside one ``mapInPandas`` pass:

- k-gram hashes: Spark's ``xxhash64`` (seed 42, XXH64 over UTF8 bytes)
  re-implemented as vectorized numpy uint64 arithmetic for the 16-byte
  ASCII fast path (the same two 8-byte rounds + avalanche the DuckDB
  oracle mirror ``functions.scalars.sql_xxhash64_ascii16`` emits), and
  as a full any-length scalar XXH64 for the non-ASCII fallback — both
  property-tested against ``F.xxhash64`` (tests/test_text_arrow.py).
- window min: an O(N log w) doubling tournament over the position
  stream (signed-int64 comparisons, matching ``min`` over LONG).
- distinct: one lexsort per batch — fingerprints never leave the task
  until deduplicated.

The per-document work never crosses rows, so the pass is shuffle-free:
the downstream pair join (``dedup.bucket_pair_counts``) receives the
~2/(w+1)-selected fingerprints directly — the declarative plan's
O(chars) doc_id exchange and distinct exchange disappear.

Bit-identity with the declarative path (same (doc_id, n_kgrams, wmin)
set) is pinned by tests/test_text_arrow.py at sf0.001/sf0.01 plus a
constructed non-ASCII corpus; the xxhash64-mirror DuckDB oracle is
unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64_bytes(data: bytes, seed: int = _SEED) -> int:
    """Full XXH64 (any length) over ``data``, returned SIGNED like
    Spark's ``xxhash64``. Scalar reference + non-ASCII fallback."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h ^= k
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


# --- vectorized single-block MD5 (the hash64 contract) ---------------------
#
# hash64(x) = conv(substr(md5(x), 1, 15), 16, 10) — the general md5-based
# cross-engine contract (functions/scalars.py). A 16-byte ASCII k-gram is
# one 64-byte MD5 block (16 message bytes + 0x80 pad + LE bit length), so
# the full 64-round compression runs as ~400 uint32 numpy ops VECTORIZED
# across every k-gram in a batch — same digest bits as Spark's F.md5 /
# DuckDB's md5() / hashlib (property-pinned in tests/test_text_arrow.py:
# test_vectorized_md5_hash64_16_matches_spark / test_scalar_hash64).
# This is the hash the PUBLISHED winnowing contract (winnow_fingerprints'
# wmin/fp_xor digest) selects on, so winnow_fingerprints_arrow runs on it.

_MD5_S = (
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4
)
_MD5_K = [int(abs(__import__("math").sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)]
_MD5_G = (
    list(range(16))
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)]
)


def _rotl32(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _md5_hash64_16_vec(w: list[np.ndarray]) -> np.ndarray:
    """hash64 of 16-byte inputs given their four little-endian uint32
    message words: one vectorized MD5 block per row, then the first 15
    hex digits of the digest as a signed (always-positive 60-bit) int64
    — bit-identical to ``conv(substr(md5(x),1,15),16,10)``."""
    n = len(w[0])
    M = w + [np.full(n, 0x80, dtype=np.uint32)] + [
        np.zeros(n, dtype=np.uint32) for _ in range(9)
    ] + [np.full(n, 128, dtype=np.uint32), np.zeros(n, dtype=np.uint32)]
    a = np.full(n, 0x67452301, dtype=np.uint32)
    b = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d = np.full(n, 0x10325476, dtype=np.uint32)
    A0, B0 = a.copy(), b.copy()
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        tmp = d
        d = c
        c = b
        b = b + _rotl32(
            a + f + np.uint32(_MD5_K[i]) + M[_MD5_G[i]], _MD5_S[i]
        )
        a = tmp
    A = (A0 + a).astype(np.uint64)
    B = (B0 + b).astype(np.uint64)
    # digest bytes 0..7 are A then B, little-endian; the hex string is
    # those bytes in order, so the first 15 hex digits are bytes 0..6
    # plus byte 7's high nibble
    v = np.zeros(len(A), dtype=np.uint64)
    for j in range(7):
        byte = (A >> np.uint64(8 * j) if j < 4 else B >> np.uint64(8 * (j - 4))) & np.uint64(0xFF)
        v = (v << np.uint64(8)) | byte
    b7 = (B >> np.uint64(24)) & np.uint64(0xFF)
    v = (v << np.uint64(4)) | (b7 >> np.uint64(4))
    return v.view(np.int64)


def hash64_py(data: bytes) -> int:
    """Scalar hash64 (any length) via hashlib — the non-ASCII fallback."""
    import hashlib

    return int(hashlib.md5(data).hexdigest()[:15], 16)


def _xxh64_16_vec(w1: np.ndarray, w2: np.ndarray) -> np.ndarray:
    """Vectorized XXH64 of 16-byte inputs given their two little-endian
    uint64 words — the numpy twin of the SQL mirror's step chain.
    Returns signed int64 (Spark's output type)."""
    p1 = np.uint64(_P1)
    p2 = np.uint64(_P2)
    p3 = np.uint64(_P3)
    p4 = np.uint64(_P4)
    h = np.uint64((_SEED + _P5 + 16) & _M64)
    k1 = _vrotl(w1 * p2, 31) * p1
    acc = h ^ k1
    acc = _vrotl(acc, 27) * p1 + p4
    k2 = _vrotl(w2 * p2, 31) * p1
    acc = acc ^ k2
    acc = _vrotl(acc, 27) * p1 + p4
    acc = acc ^ (acc >> np.uint64(33))
    acc = acc * p2
    acc = acc ^ (acc >> np.uint64(29))
    acc = acc * p3
    acc = acc ^ (acc >> np.uint64(32))
    return acc.view(np.int64)


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """min over each window of ``w`` consecutive values: doubling
    sparse-table tournament, O(N log w) signed comparisons. Output
    length len(h) - w + 1."""
    n = len(h)
    span = 1
    m = h
    while span * 2 <= w:
        m = np.minimum(m[: len(m) - span], m[span:])
        span *= 2
    if span < w:
        m = np.minimum(m[: n - w + 1], m[w - span : w - span + n - w + 1])
    return m[: n - w + 1]


def _winnow_ascii_block(
    texts: list[bytes], k: int, w: int, use_md5: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized winnow over a block of ASCII docs (each already
    lowered/space-trimmed, length >= w + k - 1). Returns (doc_idx,
    n_kgrams, wmin) of the DISTINCT per-doc fingerprint selections.
    ``use_md5`` selects the hash64/md5 contract hash instead of XXH64;
    both vectorized hashes are 16-byte-specialized, so k MUST be 16
    (``winnow_fingerprint_set_arrow`` routes other k to the scalar
    fallback)."""
    if k != 16:
        raise ValueError("the vectorized winnow block requires k=16")
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    n_kg = lens - (k - 1)
    total = int(n_kg.sum())
    doc_rep = np.repeat(np.arange(len(texts), dtype=np.int64), n_kg)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_kg)[:-1]]), n_kg
    )
    pos = starts[doc_rep] + within
    w1 = np.zeros(total, dtype=np.uint64)
    w2 = np.zeros(total, dtype=np.uint64)
    for j in range(8):
        shift = np.uint64(8 * j)
        w1 |= buf[pos + j].astype(np.uint64) << shift
        w2 |= buf[pos + 8 + j].astype(np.uint64) << shift
    if use_md5:
        lo = np.uint64(0xFFFFFFFF)
        h = _md5_hash64_16_vec(
            [
                (w1 & lo).astype(np.uint32),
                (w1 >> np.uint64(32)).astype(np.uint32),
                (w2 & lo).astype(np.uint32),
                (w2 >> np.uint64(32)).astype(np.uint32),
            ]
        )
    else:
        h = _xxh64_16_vec(w1, w2)
    # per-doc window min on the global stream: a window never crosses a
    # doc boundary because outputs are truncated to n_kg - w + 1 per doc
    # and the stream is doc-contiguous; pad so shifted reads exist
    h_pad = np.concatenate([h, np.full(w - 1, np.iinfo(np.int64).max)])
    mins = _sliding_min(h_pad, w)
    valid = within <= (n_kg[doc_rep] - w)
    sel_doc = doc_rep[valid]
    sel_min = mins[valid]
    order = np.lexsort((sel_min, sel_doc))
    sel_doc, sel_min = sel_doc[order], sel_min[order]
    keep = np.ones(len(sel_doc), dtype=bool)
    keep[1:] = (sel_doc[1:] != sel_doc[:-1]) | (sel_min[1:] != sel_min[:-1])
    return sel_doc[keep], n_kg, sel_min[keep]


def _winnow_batch(
    pdf: pd.DataFrame,
    k: int,
    w: int,
    text_col: str,
    id_col: str,
    use_md5: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Distinct (doc_id, n_kgrams, wmin) arrays for one Arrow batch —
    each document's fingerprint rows contiguous, wmin ascending within
    a document. ASCII docs at k=16 take the vectorized block kernel;
    anything else (non-ASCII text, or a non-16 k, for which no
    16-byte-specialized vector hash applies) takes the per-doc scalar
    loop over the same character-sliced, UTF8-hashed k-grams Spark
    evaluates. ``use_md5`` selects the hash64/md5 contract hash
    (published wmin/fp_xor digests) over Spark-native XXH64."""
    scalar_hash = hash64_py if use_md5 else xxh64_bytes
    ids_out: list[np.ndarray] = []
    nkg_out: list[np.ndarray] = []
    min_out: list[np.ndarray] = []
    texts: list[bytes] = []
    text_ids: list[int] = []
    for doc_id, raw in zip(pdf[id_col], pdf[text_col]):
        t = (raw or "").strip(" ").lower()
        if len(t) < w + k - 1:
            continue
        if k == 16 and t.isascii():
            texts.append(t.encode("ascii"))
            text_ids.append(doc_id)
        else:
            # scalar fallback: character slices, UTF8 bytes — exactly
            # substr + xxhash64/hash64 on this doc, any k
            n_kg = len(t) - (k - 1)
            hs = [scalar_hash(t[i : i + k].encode("utf-8")) for i in range(n_kg)]
            sel = sorted({min(hs[i : i + w]) for i in range(n_kg - w + 1)})
            ids_out.append(np.full(len(sel), doc_id, dtype=np.int64))
            nkg_out.append(np.full(len(sel), n_kg, dtype=np.int64))
            min_out.append(np.array(sel, dtype=np.int64))
    if texts:
        doc_idx, n_kg, wmin = _winnow_ascii_block(texts, k, w, use_md5)
        tid = np.asarray(text_ids, dtype=np.int64)
        ids_out.append(tid[doc_idx])
        nkg_out.append(n_kg[doc_idx])
        min_out.append(wmin)
    if not ids_out:
        return None
    return (
        np.concatenate(ids_out),
        np.concatenate(nkg_out),
        np.concatenate(min_out),
    )


def _spread(df: DataFrame, cols: list[str]) -> DataFrame:
    """Compute-bound map pass: spread across the core budget when the
    source arrives in fewer splits than cores (same rule as
    vector_arrow.cell_assignments_arrow)."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    source = df.select(*cols)
    if source.rdd.getNumPartitions() < n_parts:
        source = source.repartition(n_parts)
    return source


def winnow_fingerprint_set_arrow(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    internal_hash: bool = False,
) -> DataFrame:
    """Arrow-executed twin of ``text.winnow_fingerprint_set``: distinct
    (id, n_kgrams, wmin) per document, identical min-selection and
    tie-free semantics — with the explode, the per-doc window exchange,
    and the distinct exchange all collapsed into one shuffle-free map
    pass. ``internal_hash`` mirrors the declarative flag INCLUDING its
    default (ADVICE r9: the two twins must pick the same fingerprint
    hash family under default args): False (default) uses the md5-based
    hash64 cross-engine contract (the published wmin/fp_xor digests),
    True swaps in Spark-native xxhash64 for internal-key callers
    (pair generation, where only counts are published).

    Normalization mirrors the declarative path exactly: ``lower(trim())``
    trims SPACES only (Spark/DuckDB ``trim`` semantics — not Python
    ``str.strip``'s all-whitespace). ASCII documents at k=16 (the
    measured shape of every SF corpus) take the vectorized block kernel;
    non-ASCII documents — and every document when k != 16, where no
    16-byte-specialized vector hash applies — fall back to a per-doc
    scalar loop over the same character-sliced, UTF8-hashed k-grams."""
    out_schema = f"{id_col} long, n_kgrams int, wmin long"
    source = _spread(df, [id_col, text_col])

    def winnow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            got = _winnow_batch(pdf, k, w, text_col, id_col, not internal_hash)
            if got is None:
                continue
            ids, nkg, wmin = got
            yield pd.DataFrame(
                {id_col: ids, "n_kgrams": nkg.astype(np.int32), "wmin": wmin}
            )

    return source.mapInPandas(winnow, out_schema)


def winnow_fingerprints_arrow(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-executed twin of ``text.winnow_fingerprints`` (the PUBLISHED
    md5/hash64 contract): per-document (id, n_kgrams, n_fingerprints,
    fp_xor). The count and the order-free XOR digest reduce over each
    document's distinct fingerprint set INSIDE the map task — a document
    never crosses batches, so the whole query is one shuffle-free pass
    (the declarative plan's doc_id window exchange, distinct, and final
    aggregate exchange all disappear). Bit-identity with the declarative
    rollup is pinned by tests/test_text_arrow.py."""
    out_schema = (
        f"{id_col} long, n_kgrams int, n_fingerprints long, fp_xor long"
    )
    source = _spread(df, [id_col, text_col])

    def winnow_agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            got = _winnow_batch(pdf, k, w, text_col, id_col, use_md5=True)
            if got is None:
                continue
            ids, nkg, wmin = got
            # each doc's rows are contiguous: reduce count/xor per group
            bounds = np.flatnonzero(
                np.concatenate([[True], ids[1:] != ids[:-1]])
            )
            counts = np.diff(np.concatenate([bounds, [len(ids)]]))
            fp_xor = np.bitwise_xor.reduceat(wmin.view(np.uint64), bounds)
            yield pd.DataFrame(
                {
                    id_col: ids[bounds],
                    "n_kgrams": nkg[bounds].astype(np.int32),
                    "n_fingerprints": counts.astype(np.int64),
                    "fp_xor": fp_xor.view(np.int64),
                }
            )

    return source.mapInPandas(winnow_agg, out_schema)
