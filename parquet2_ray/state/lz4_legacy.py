"""Hadoop-framed LZ4 sniffing for legacy ``LZ4``-codec payloads.

Parquet files written by the Hadoop Lz4Codec (old Hive / Impala
writers on the deprecated ``LZ4`` codec id) wrap every compressed
buffer in one or more frames::

    [be32 decompressed_size][be32 compressed_size][lz4 block bytes]...

while other writers using the same codec id emit a bare LZ4 block, and
this engine's own containers use the LZ4 *frame* format (pyarrow's
``lz4`` codec).  The reference resolves the ambiguity by attempting
the Hadoop framing first and falling back to a plain block
(/root/reference/src/compression.rs:195-198 ``try_decompress_hadoop``
:231-287, exercised by tests/it/read/lz4_legacy.rs:30-55); this module
is that behavior re-expressed over pyarrow's block codec, with the
frame format added to the fallback chain for this engine's own output.

The sniff cannot false-positive in practice: the frame walker demands
that every frame's advertised sizes be internally consistent, that the
input be consumed exactly, and that the output total equal the
caller's expected size — a bare block or frame-format payload fails
the first header check instead (an LZ4-frame magic read as a be32
advertises a ~70 MB frame).
"""

from __future__ import annotations

import struct

import pyarrow as pa

__all__ = ["decompress_hadoop_lz4", "decompress_lz4_any",
           "compress_hadoop_lz4"]

_PREFIX = struct.Struct(">II")


def decompress_hadoop_lz4(buf: bytes, expected_size: int) -> bytes:
    """Decode a Hadoop-framed LZ4 payload to exactly ``expected_size``
    bytes; raises ``ValueError`` if the buffer is not Hadoop-framed."""
    raw = pa.Codec("lz4_raw")
    out: list[bytes] = []
    pos, total = 0, 0
    n = len(buf)
    while n - pos >= _PREFIX.size:
        dsize, csize = _PREFIX.unpack_from(buf, pos)
        pos += _PREFIX.size
        if csize > n - pos:
            raise ValueError("hadoop frame: not enough compressed bytes")
        if total + dsize > expected_size:
            raise ValueError("hadoop frame: output exceeds advertised size")
        try:
            piece = raw.decompress(buf[pos:pos + csize], dsize, asbytes=True)
        except Exception as e:  # arrow raises several types here
            raise ValueError(f"hadoop frame: block decode failed: {e}")
        if len(piece) != dsize:
            raise ValueError("hadoop frame: unexpected decompressed size")
        out.append(piece)
        total += dsize
        pos += csize
    if pos != n or total != expected_size:
        raise ValueError("hadoop frame: input not consumed exactly")
    return b"".join(out)


def decompress_lz4_any(buf: bytes, expected_size: int) -> bytes:
    """LZ4 payload of unknown framing → bytes: Hadoop frames first
    (reference order), then the LZ4 frame format (this engine's own
    containers), then a bare block."""
    try:
        return decompress_hadoop_lz4(buf, expected_size)
    except ValueError:
        pass
    try:
        return pa.Codec("lz4").decompress(buf, expected_size, asbytes=True)
    except Exception:
        return pa.Codec("lz4_raw").decompress(
            buf, expected_size, asbytes=True)


def compress_hadoop_lz4(data: bytes, frame_size: int = 128 * 1024) -> bytes:
    """Hadoop-framed LZ4 writer (the fixture producer for interop
    tests; real engine output stays on the frame format)."""
    raw = pa.Codec("lz4_raw")
    parts: list[bytes] = []
    for off in range(0, len(data), frame_size) or [0]:
        piece = data[off:off + frame_size]
        comp = raw.compress(piece, asbytes=True)
        parts.append(_PREFIX.pack(len(piece), len(comp)))
        parts.append(comp)
    return b"".join(parts)
