"""Pure-Python blosc1 chunk container codec (read + write).

The reference's DEFAULT compressor is Blosc-zstd clevel 5
(``/root/reference/src/mdio/builder/schemas/compressors.py:20-29``), so a
default-config store written by upstream MDIO arrives as blosc1-framed
chunks. This module implements the public c-blosc *chunk format* (c-blosc
``README_CHUNK_FORMAT.rst`` / ``blosc.c``, BSD-licensed spec) directly,
delegating the inner streams to codecs available in this container
(pyarrow's zstd / lz4-block / snappy, stdlib zlib). No blosc library
needed.

Chunk layout (all ints little-endian):

  byte 0      format version
  byte 1      inner-codec format version
  byte 2      flags: 0x01 byte-shuffle | 0x02 memcpyed | 0x04 bit-shuffle
              | 0x10 dont-split | compressor code << 5
              (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
  byte 3      typesize
  bytes 4-7   nbytes  (uncompressed size)
  bytes 8-11  blocksize
  bytes 12-15 cbytes  (total compressed chunk size, header included)

  memcpyed: raw payload follows. Otherwise: int32 offsets (one per block,
  absolute within the chunk) then the blocks. Each block holds
  ``nsplits`` streams — ``typesize`` streams for full blocks when the
  dont-split flag is clear, else one — and each stream is
  ``int32 stream_cbytes`` + payload, stored RAW when
  ``stream_cbytes == neblock`` (codec expansion guard). Byte-shuffle is
  applied per block before compression: byte ``j`` of every element
  grouped together (a (elems, typesize) -> (typesize, elems) transpose),
  with any non-multiple tail copied through unshuffled.

Bit-shuffle (flag 0x04) is implemented as the pure-numpy equivalent of
c-blosc's ``bshuf_trans_bit_elem`` pipeline (bitshuffle-generic.c:
byte-transpose within elements, then an 8x8 bit transpose per byte-row,
then the bitrow regroup): the block is the (elems, typesize) byte matrix,
unpacked LSB-first to an (elems, 8*typesize) bit matrix, transposed, and
repacked — output row ``j*8 + k`` holds bit ``k`` of byte ``j`` of every
element, elements packed LSB-first. Per c-blosc, only the largest
multiple-of-8 prefix of elements transforms; leftover bytes copy through
verbatim.

Unsupported on purpose: blosclz streams (no decoder in this container) —
raised as :class:`UnsupportedBloscError` naming the feature, never
misparsed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FLAG_SHUFFLE = 0x01
FLAG_MEMCPYED = 0x02
FLAG_BITSHUFFLE = 0x04
FLAG_DONT_SPLIT = 0x10

CODEC_BLOSCLZ, CODEC_LZ4, CODEC_SNAPPY, CODEC_ZLIB, CODEC_ZSTD = range(5)
_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_NAME_CODES = {
    "blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2, "zlib": 3, "zstd": 4,
}

class UnsupportedBloscError(ValueError):
    """Chunk uses a blosc feature with no decoder in this container."""


def _decompress_stream(codec: int, payload: bytes, out_size: int) -> bytes:
    if codec == CODEC_ZSTD:
        import pyarrow as pa

        return pa.Codec("zstd").decompress(payload, out_size).to_pybytes()
    if codec == CODEC_LZ4:
        import pyarrow as pa

        return pa.Codec("lz4_raw").decompress(payload, out_size).to_pybytes()
    if codec == CODEC_SNAPPY:
        import pyarrow as pa

        return pa.Codec("snappy").decompress(payload, out_size).to_pybytes()
    if codec == CODEC_ZLIB:
        return zlib.decompress(payload)
    raise UnsupportedBloscError(
        f"blosc inner codec {_CODEC_NAMES.get(codec, codec)!r} has no "
        "decoder in this container (supported: zstd, lz4, snappy, zlib)"
    )


def _compress_stream(codec: int, payload: bytes, level: int) -> bytes:
    if codec == CODEC_ZSTD:
        import pyarrow as pa

        return pa.Codec("zstd", compression_level=level).compress(
            payload
        ).to_pybytes()
    if codec == CODEC_LZ4:
        import pyarrow as pa

        return pa.Codec("lz4_raw").compress(payload).to_pybytes()
    if codec == CODEC_SNAPPY:
        import pyarrow as pa

        return pa.Codec("snappy").compress(payload).to_pybytes()
    if codec == CODEC_ZLIB:
        return zlib.compress(payload, level)
    raise UnsupportedBloscError(f"cannot encode blosc inner codec {codec}")


def _unshuffle(block: bytes, typesize: int) -> bytes:
    """Inverse byte-shuffle: (typesize, elems) -> interleaved elements.
    The non-multiple tail rides through unshuffled (c-blosc semantics)."""
    n = len(block)
    elems = n // typesize
    body = elems * typesize
    arr = np.frombuffer(block[:body], dtype=np.uint8)
    out = arr.reshape(typesize, elems).T.tobytes()
    return out + block[body:]


def _shuffle(block: bytes, typesize: int) -> bytes:
    n = len(block)
    elems = n // typesize
    body = elems * typesize
    arr = np.frombuffer(block[:body], dtype=np.uint8)
    out = arr.reshape(elems, typesize).T.tobytes()
    return out + block[body:]


def _bitshuffle_sizes(n: int, typesize: int) -> int:
    """Bytes covered by the bit transform: c-blosc transforms only the
    largest multiple-of-8 prefix of elements (``bitshuffle()`` in
    shuffle.c: ``size -= size % 8``); the rest memcpys through."""
    elems = n // typesize
    return (elems - elems % 8) * typesize


def _bit_shuffle(block: bytes, typesize: int) -> bytes:
    """c-blosc bit-shuffle: (elems, typesize) bytes -> (8*typesize,
    elems/8) packed bit-planes, row ``j*8 + k`` = bit k (LSB-first) of
    byte j across elements, elements packed LSB-first within each row."""
    body = _bitshuffle_sizes(len(block), typesize)
    if body == 0:
        return block
    data = np.frombuffer(block[:body], np.uint8).reshape(-1, typesize)
    bits = np.unpackbits(data, axis=1, bitorder="little")
    out = np.packbits(bits.T, axis=1, bitorder="little")
    return out.tobytes() + block[body:]


def _bit_unshuffle(block: bytes, typesize: int) -> bytes:
    """Inverse of :func:`_bit_shuffle` (same prefix/leftover split)."""
    body = _bitshuffle_sizes(len(block), typesize)
    if body == 0:
        return block
    planes = np.frombuffer(block[:body], np.uint8).reshape(8 * typesize, -1)
    bits = np.unpackbits(planes, axis=1, bitorder="little")
    data = np.packbits(bits.T, axis=1, bitorder="little")
    return data.tobytes() + block[body:]


def decompress(chunk: bytes) -> bytes:
    """Decode one blosc1 chunk to its raw bytes."""
    if len(chunk) < 16:
        raise ValueError(f"blosc chunk too short: {len(chunk)} bytes")
    _version, _versionlz, flags, typesize = struct.unpack_from("<BBBB", chunk, 0)
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", chunk, 4)
    if cbytes != len(chunk):
        # tolerate trailing padding some writers add, never truncation
        if cbytes > len(chunk):
            raise ValueError(
                f"blosc chunk truncated: header says {cbytes}, have {len(chunk)}"
            )
    if flags & FLAG_MEMCPYED:
        return bytes(chunk[16 : 16 + nbytes])
    codec = flags >> 5
    # byte-shuffle is a recorded no-op at typesize 1; bit-shuffle applies
    # at ANY typesize (c-blosc sets DOBITSHUFFLE unconditionally)
    shuffled = bool(flags & FLAG_SHUFFLE) and typesize > 1
    bit_shuffled = bool(flags & FLAG_BITSHUFFLE)
    dont_split = bool(flags & FLAG_DONT_SPLIT)
    if blocksize <= 0:
        raise ValueError(f"bad blosc blocksize {blocksize}")
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}i", chunk, 16)
    out = bytearray(nbytes)
    pos_out = 0
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - pos_out)
        leftover = bsize != blocksize
        nsplits = typesize if (not dont_split and not leftover) else 1
        neblock = bsize // nsplits
        pos = bstarts[j]
        parts = []
        for _s in range(nsplits):
            (s_cbytes,) = struct.unpack_from("<i", chunk, pos)
            pos += 4
            payload = chunk[pos : pos + s_cbytes]
            pos += s_cbytes
            if s_cbytes == neblock:  # stored raw (expansion guard)
                parts.append(bytes(payload))
            else:
                parts.append(_decompress_stream(codec, bytes(payload), neblock))
        block = b"".join(parts)
        if len(block) != bsize:
            raise ValueError(
                f"blosc block {j}: decoded {len(block)} != expected {bsize}"
            )
        if bit_shuffled:
            block = _bit_unshuffle(block, typesize)
        elif shuffled:
            block = _unshuffle(block, typesize)
        out[pos_out : pos_out + bsize] = block
        pos_out += bsize
    return bytes(out)


def compress(
    data: bytes,
    typesize: int = 4,
    cname: str = "zstd",
    clevel: int = 5,
    shuffle: bool | str = True,
    blocksize: int = 0,
) -> bytes:
    """Encode raw bytes as a blosc1 chunk other blosc readers open.

    ``shuffle``: ``True``/``"byte"`` for byte-shuffle, ``"bit"`` for
    bit-shuffle, ``False`` for none. Writes in dont-split mode (one
    stream per block — the header flag records it, so any
    spec-conformant reader decodes correctly). ``blocksize=0`` picks one
    block up to 1 MiB, rounded to ``typesize`` (8x ``typesize`` for
    bit-shuffle, so full blocks transform without a leftover tail).
    """
    codec = _NAME_CODES.get(cname)
    if codec is None or codec == CODEC_BLOSCLZ:
        raise UnsupportedBloscError(f"cannot encode blosc cname {cname!r}")
    nbytes = len(data)
    if typesize > 255:
        # c-blosc clamps typesize > BLOSC_MAX_TYPESIZE to 1 (shuffle
        # becomes a no-op); mirroring that beats silently shuffling with
        # one typesize and recording another — which produced chunks
        # every conformant reader (including ours) un-shuffles wrong
        typesize = 1
    bit_shuffle = shuffle == "bit"
    shuffle = bool(shuffle) and not bit_shuffle and typesize > 1
    grain = typesize * 8 if bit_shuffle else typesize
    if blocksize <= 0:
        blocksize = min(max(nbytes, grain), 1 << 20)
    blocksize = max(grain, blocksize - blocksize % grain)
    flags = (
        (FLAG_SHUFFLE if shuffle else 0)
        | (FLAG_BITSHUFFLE if bit_shuffle else 0)
        | FLAG_DONT_SPLIT
        | (codec << 5)
    )
    nblocks = max(1, -(-nbytes // blocksize))
    streams: list[bytes] = []
    pos = 0
    for _j in range(nblocks):
        bsize = min(blocksize, nbytes - pos)
        block = data[pos : pos + bsize]
        pos += bsize
        if bit_shuffle:
            block = _bit_shuffle(block, typesize)
        elif shuffle:
            block = _shuffle(block, typesize)
        comp = _compress_stream(codec, block, clevel)
        if len(comp) >= bsize:  # expansion guard: store raw
            comp = block
        streams.append(struct.pack("<i", len(comp)) + comp)
    bstarts, offsets = [], 16 + 4 * nblocks
    for s in streams:
        bstarts.append(offsets)
        offsets += len(s)
    body = struct.pack(f"<{nblocks}i", *bstarts) + b"".join(streams)
    cbytes = 16 + len(body)
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, cbytes
    )
    return header + body
