"""Foreign-parquet bloom-filter READ interop (reference
src/bloom_filter/read.rs:14 — the consume side the engine lacked).

Neither pyarrow 16 nor duckdb 1.0 exposes parquet's embedded bloom
filters, so this module implements the read path from the PUBLIC
parquet-format spec directly:

- a minimal Thrift COMPACT-protocol decoder (varint/zigzag, struct,
  list, binary — everything a parquet footer uses),
- footer navigation: FileMetaData → RowGroup → ColumnChunk →
  ColumnMetaData.bloom_filter_offset (field 14) / _length (field 15),
- BloomFilterHeader parsing (numBytes + algorithm/hash/compression
  unions) followed by the raw SBBF bitset, probed with this repo's
  spec-exact xxh64 + salted-block check (`functions/bloom.py`).

The decoder is cross-validated against pyarrow's own metadata API on
pyarrow-written files (num_rows, row-group shapes, column paths); the
bloom path is exercised with spec-conformant fixture bytes because no
library in this environment can WRITE embedded blooms (documented
sandbox limit — the write side ships as sidecars, parquet_interop.py).

Thrift compact field types (spec): 0 STOP, 1 TRUE, 2 FALSE, 3 BYTE,
4 I16, 5 I32, 6 I64, 7 DOUBLE, 8 BINARY, 9 LIST, 10 SET, 11 MAP,
12 STRUCT.
"""

from __future__ import annotations

import struct as _struct

__all__ = ["parse_footer", "read_embedded_blooms",
            "probe_embedded_bloom", "compact_struct"]


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_value(buf: bytes, pos: int, ftype: int):
    if ftype in (1, 2):                       # bool packed in field header
        return ftype == 1, pos
    if ftype == 3:                            # byte
        return _struct.unpack_from("b", buf, pos)[0], pos + 1
    if ftype in (4, 5, 6):                    # i16/i32/i64: zigzag varint
        v, pos = _varint(buf, pos)
        return _zigzag(v), pos
    if ftype == 7:                            # double, little-endian
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == 8:                            # binary: len + bytes
        n, pos = _varint(buf, pos)
        return buf[pos:pos + n], pos + n
    if ftype in (9, 10):                      # list/set
        head = buf[pos]
        pos += 1
        size, etype = head >> 4, head & 0x0F
        if size == 15:
            size, pos = _varint(buf, pos)
        out = []
        for _ in range(size):
            v, pos = _read_value(buf, pos, etype)
            out.append(v)
        return out, pos
    if ftype == 11:                           # map
        size, pos = _varint(buf, pos)
        if size == 0:
            return {}, pos
        kv = buf[pos]
        pos += 1
        ktype, vtype = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k, pos = _read_value(buf, pos, ktype)
            v, pos = _read_value(buf, pos, vtype)
            out[k] = v
        return out, pos
    if ftype == 12:                           # struct
        return compact_struct(buf, pos)
    raise ValueError(f"unsupported thrift compact type {ftype}")


def compact_struct(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    """Decode one compact-protocol struct → {field_id: value}."""
    out: dict = {}
    fid = 0
    while True:
        head = buf[pos]
        pos += 1
        if head == 0:                         # STOP
            return out, pos
        delta, ftype = head >> 4, head & 0x0F
        if delta:
            fid += delta
        else:
            v, pos = _varint(buf, pos)
            fid = _zigzag(v)
        val, pos = _read_value(buf, pos, ftype)
        out[fid] = val


def parse_footer(data: bytes) -> dict:
    """Parse a parquet file's footer bytes (whole file or a tail slice
    ending in ``<footer><len:4><'PAR1'>``) into the FileMetaData struct
    keyed by thrift field ids:

        1 version, 2 schema[], 3 num_rows, 4 row_groups[]
        RowGroup: 1 columns[], 2 total_byte_size, 3 num_rows
        ColumnChunk: 2 file_offset, 3 meta_data
        ColumnMetaData: 3 path_in_schema, 4 codec, 5 num_values,
                        14 bloom_filter_offset, 15 bloom_filter_length
    """
    if data[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing trailing magic)")
    flen = int.from_bytes(data[-8:-4], "little")
    if flen + 8 > len(data):
        # negative slicing would silently clamp to the buffer start and
        # hand compact_struct a truncated byte run — fail loudly so the
        # caller re-reads with a bigger tail
        raise ValueError(
            f"footer is {flen} bytes but only {len(data) - 8} were "
            "provided — re-read with a larger tail")
    fbytes = data[-8 - flen:-8]
    meta, _ = compact_struct(fbytes, 0)
    return meta


def read_embedded_blooms(path: str, filesystem=None) -> list[dict]:
    """Read every embedded bloom filter of a parquet file.

    Returns one entry per (row_group, column) that records a
    ``bloom_filter_offset``: {"row_group", "column" (dotted path),
    "num_bytes", "bitset": bytes}.  Files with no embedded blooms
    (everything pyarrow/duckdb writes today) return [].
    """
    from pyarrow import fs as pafs

    fs = filesystem or pafs.LocalFileSystem()
    with fs.open_input_file(path) as f:
        size = f.size()
        # exact-size footer read: last 8 bytes give the thrift length,
        # so even a multi-MB footer (wide schemas, many row groups)
        # parses correctly instead of truncating at a guessed tail
        f.seek(max(0, size - 8))
        tail8 = f.read(8)
        flen = int.from_bytes(tail8[:4], "little")
        f.seek(max(0, size - 8 - flen))
        tail = f.read(flen + 8)
        meta = parse_footer(tail)
        out = []
        for rg_i, rg in enumerate(meta.get(4, [])):
            for col in rg.get(1, []):
                cm = col.get(3)
                if not cm or 14 not in cm:
                    continue
                off = cm[14]
                f.seek(off)
                # BloomFilterHeader is tiny; 64 B covers it
                head = f.read(64)
                hdr, hlen = compact_struct(head, 0)
                nbytes = hdr[1]
                # unions: algorithm(2)=BLOCK(1), hash(3)=XXHASH(1),
                # compression(4)=UNCOMPRESSED(1) — the only spec'd values
                if set(hdr.get(2, {1: {}})) != {1} or \
                        set(hdr.get(3, {1: {}})) != {1}:
                    raise ValueError("unsupported bloom algorithm/hash")
                f.seek(off + hlen)
                bitset = f.read(nbytes)
                out.append({
                    "row_group": rg_i,
                    "column": ".".join(
                        p.decode() if isinstance(p, bytes) else p
                        for p in cm.get(3, [])),
                    "num_bytes": nbytes,
                    "bitset": bitset,
                })
        return out


def probe_embedded_bloom(bloom: dict, values, type_str: str | None = None):
    """Membership probe of one embedded bloom entry → bool per value
    (spec xxh64-over-PLAIN hash + salted SBBF block check)."""
    from ..functions import bloom as _bloom

    h = _bloom.hash_values(list(values), type_str)
    return _bloom.might_contain(bloom["bitset"], h)
