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
        if etype in (1, 2):
            # list elements carry no field header: bools are one byte
            # each (1=true), unlike the header-packed struct-field form
            for _ in range(size):
                out.append(buf[pos] == 1)
                pos += 1
            return out, pos
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
                        set(hdr.get(3, {1: {}})) != {1} or \
                        set(hdr.get(4, {1: {}})) != {1}:
                    raise ValueError(
                        "unsupported bloom algorithm/hash/compression")
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


# ---------------------------------------------------------------------------
# WRITE side: embed SBBF blooms into an existing parquet file.
#
# Requires a LOSSLESS footer re-encode, so this typed codec preserves
# (field id, wire type, value) triples in order.  The patched file must
# stay readable by pyarrow/duckdb — that is the cross-engine test.


def typed_decode_struct(buf: bytes, pos: int = 0):
    """Compact-protocol struct → ordered [(fid, ftype, value)] with full
    type fidelity (re-encodable byte-compatibly modulo header deltas)."""
    out = []
    fid = 0
    while True:
        head = buf[pos]
        pos += 1
        if head == 0:
            return out, pos
        delta, ftype = head >> 4, head & 0x0F
        if delta:
            fid += delta
        else:
            v, pos = _varint(buf, pos)
            fid = _zigzag(v)
        val, pos = _typed_value(buf, pos, ftype)
        out.append((fid, ftype, val))


def _typed_value(buf: bytes, pos: int, ftype: int):
    if ftype in (1, 2):
        return ftype == 1, pos                 # packed in the header
    if ftype == 3:
        return _struct.unpack_from("b", buf, pos)[0], pos + 1
    if ftype in (4, 5, 6):
        v, pos = _varint(buf, pos)
        return _zigzag(v), pos
    if ftype == 7:
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == 8:
        n, pos = _varint(buf, pos)
        return buf[pos:pos + n], pos + n
    if ftype in (9, 10):
        head = buf[pos]
        pos += 1
        size, etype = head >> 4, head & 0x0F
        if size == 15:
            size, pos = _varint(buf, pos)
        items = []
        for _ in range(size):
            if etype in (1, 2):                # bool LIST elements: 1 byte
                items.append(buf[pos] == 1)
                pos += 1
            else:
                v, pos = _typed_value(buf, pos, etype)
                items.append(v)
        return (etype, items), pos
    if ftype == 11:
        size, pos = _varint(buf, pos)
        if size == 0:
            return (0, 0, []), pos
        kv = buf[pos]
        pos += 1
        ktype, vtype = kv >> 4, kv & 0x0F
        items = []
        for _ in range(size):
            k, pos = _typed_value(buf, pos, ktype)
            v, pos = _typed_value(buf, pos, vtype)
            items.append((k, v))
        return (ktype, vtype, items), pos
    if ftype == 12:
        return typed_decode_struct(buf, pos)
    raise ValueError(f"unsupported thrift compact type {ftype}")


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> bytes:
    return _enc_uvarint((v << 1) ^ (v >> 63))


def typed_encode_struct(fields) -> bytes:
    """Inverse of :func:`typed_decode_struct` (fields in decoded order)."""
    out = bytearray()
    prev = 0
    for fid, ftype, val in fields:
        wire = ftype
        if ftype in (1, 2):                    # bool: value picks the type
            wire = 1 if val else 2
        delta = fid - prev
        if 0 < delta <= 15:
            out.append((delta << 4) | wire)
        else:
            out.append(wire)
            out += _enc_zigzag(fid)
        out += _typed_encode_value(wire, val)
        prev = fid
    out.append(0)
    return bytes(out)


def _typed_encode_value(ftype: int, val) -> bytes:
    if ftype in (1, 2):
        return b""                             # packed in the header
    if ftype == 3:
        return _struct.pack("b", val)
    if ftype in (4, 5, 6):
        return _enc_zigzag(val)
    if ftype == 7:
        return _struct.pack("<d", val)
    if ftype == 8:
        return _enc_uvarint(len(val)) + bytes(val)
    if ftype in (9, 10):
        etype, items = val
        n = len(items)
        head = bytes([(n << 4) | etype]) if n < 15 else \
            bytes([0xF0 | etype]) + _enc_uvarint(n)
        body = bytearray(head)
        for it in items:
            if etype in (1, 2):
                body.append(1 if it else 2)
            else:
                body += _typed_encode_value(etype, it)
        return bytes(body)
    if ftype == 11:
        ktype, vtype, items = val
        if not items:
            return b"\x00"
        body = bytearray(_enc_uvarint(len(items)))
        body.append((ktype << 4) | vtype)
        for k, v in items:
            body += _typed_encode_value(ktype, k)
            body += _typed_encode_value(vtype, v)
        return bytes(body)
    if ftype == 12:
        return typed_encode_struct(val)
    raise ValueError(f"unsupported thrift compact type {ftype}")


def _fields_get(fields, fid):
    for i, (f, t, v) in enumerate(fields):
        if f == fid:
            return i, t, v
    return None, None, None


def embed_blooms(src_path: str, dst_path: str,
                 columns: list[str] | None = None,
                 bits_per_value: int = 10) -> dict:
    """Rewrite a parquet file with SPEC-EMBEDDED SBBF bloom filters.

    For each (row group, column) whose dotted path is in ``columns``
    (default: every string/binary/int column), the column's values are
    read, hashed with the spec xxh64-over-PLAIN rule, built into a
    split-block bloom, and appended after the data region; the footer
    is losslessly re-encoded with ``bloom_filter_offset``/``_length``
    (ColumnMetaData fields 14/15).  Data page offsets are untouched, so
    pyarrow/duckdb read the patched file unchanged — which is exactly
    what the tests assert (the cross-engine evidence for the write
    side; reference write path: the parquet-format bloom spec).

    Returns {"n_blooms", "bloom_bytes", "dst"}.
    """
    import pyarrow.parquet as _pq

    from ..functions import bloom as _bloom

    data = open(src_path, "rb").read()
    if data[-4:] != b"PAR1":
        raise ValueError("not a parquet file")
    flen = int.from_bytes(data[-8:-4], "little")
    footer_start = len(data) - 8 - flen
    meta, _ = typed_decode_struct(data[footer_start:len(data) - 8], 0)

    pf = _pq.ParquetFile(src_path)
    body = bytearray(data[:footer_start])
    n_blooms = 0
    bloom_bytes = 0

    # meta fields: 4 = row_groups list<struct>
    for fi, (fid, ftype, val) in enumerate(meta):
        if fid != 4:
            continue
        etype, rgs = val
        for rg_i, rg in enumerate(rgs):
            ci, ct, cols = _fields_get(rg, 1)      # columns list<struct>
            cetype, chunks = cols
            for c_i, chunk in enumerate(chunks):
                mi, mt, cm = _fields_get(chunk, 3)  # ColumnMetaData
                if cm is None:
                    continue
                _, _, pathv = _fields_get(cm, 3)    # path_in_schema
                path = ".".join(
                    p.decode() if isinstance(p, bytes) else p
                    for p in pathv[1])
                if columns is not None and path not in columns:
                    continue
                if path not in pf.schema_arrow.names:
                    continue                        # nested leaf: skip
                col = pf.read_row_group(
                    rg_i, columns=[path])[path].combine_chunks()
                h = _bloom.hash_arrow(col)
                if h.size == 0:
                    continue
                bits = _bloom.build(
                    h, _bloom.num_blocks_for(len(col), bits_per_value))
                header = typed_encode_struct([
                    (1, 5, len(bits)),              # numBytes
                    (2, 12, [(1, 12, [])]),         # BLOCK
                    (3, 12, [(1, 12, [])]),         # XXHASH
                    (4, 12, [(1, 12, [])]),         # UNCOMPRESSED
                ])
                off = len(body)
                body += header
                body += bits
                # patch/insert fields 14/15 keeping ascending id order
                cm = [f for f in cm if f[0] not in (14, 15)] + \
                     [(14, 6, off), (15, 5, len(header) + len(bits))]
                cm.sort(key=lambda f: f[0])
                chunks[c_i] = [
                    (f, t, cm if f == 3 else v) for f, t, v in chunk]
                n_blooms += 1
                bloom_bytes += len(header) + len(bits)

    new_footer = typed_encode_struct(meta)
    body += new_footer
    body += len(new_footer).to_bytes(4, "little")
    body += b"PAR1"
    with open(dst_path, "wb") as f:
        f.write(body)
    return {"n_blooms": n_blooms, "bloom_bytes": bloom_bytes,
            "dst": dst_path}
