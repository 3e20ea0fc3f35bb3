"""Foreign-parquet bloom READ interop (sources/parquet_bloom.py).

Layer 1 cross-validates the thrift compact decoder against pyarrow's
own metadata API on real pyarrow-written files; layer 2 exercises the
bloom read path on spec-encoded fixture bytes (nothing in this
environment can WRITE embedded blooms — the fixture builder below is a
from-the-spec compact encoder living only in this test).
"""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

from parquet2_ray.functions import bloom as bloom_mod
from parquet2_ray.sources.parquet_bloom import (
    compact_struct,
    parse_footer,
    probe_embedded_bloom,
    read_embedded_blooms,
)

# ------------------------- tiny compact-protocol ENCODER (fixture only)


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> bytes:
    return _uvarint((v << 1) ^ (v >> 63))


def _field(prev_id: int, fid: int, ftype: int) -> bytes:
    delta = fid - prev_id
    if 0 < delta <= 15:
        return bytes([(delta << 4) | ftype])
    return bytes([ftype]) + _zz(fid)


def _enc_struct(fields: list[tuple[int, int, bytes]]) -> bytes:
    """fields = [(field_id, type, encoded_value)] in ascending id order."""
    out = bytearray()
    prev = 0
    for fid, ftype, payload in fields:
        out += _field(prev, fid, ftype)
        out += payload
        prev = fid
    out.append(0)  # STOP
    return bytes(out)


def _enc_binary(b: bytes) -> bytes:
    return _uvarint(len(b)) + b


def _enc_list(etype: int, items: list[bytes]) -> bytes:
    n = len(items)
    head = bytes([(n << 4) | etype]) if n < 15 else \
        bytes([0xF0 | etype]) + _uvarint(n)
    return head + b"".join(items)


# ------------------------------------------ layer 1: real-file footers


def test_footer_parse_matches_pyarrow(tmp_path):
    tbl = pa.table({
        "doc_id": pa.array(np.arange(5000, dtype=np.int64)),
        "text": pa.array([f"row {i}" for i in range(5000)]),
    })
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p, row_group_size=1500)
    meta = parse_footer(open(p, "rb").read())
    pmd = pq.ParquetFile(p).metadata
    assert meta[3] == pmd.num_rows
    rgs = meta[4]
    assert len(rgs) == pmd.num_row_groups
    for i, rg in enumerate(rgs):
        assert rg[3] == pmd.row_group(i).num_rows
        cols = rg[1]
        assert len(cols) == pmd.num_columns
        for j, col in enumerate(cols):
            cm = col[3]
            want = pmd.row_group(i).column(j)
            path = ".".join(x.decode() for x in cm[3])
            assert path == want.path_in_schema
            assert cm[5] == want.num_values
            assert 14 not in cm  # pyarrow writes no blooms


def test_footer_parse_duckdb_file(tmp_path):
    import duckdb

    p = str(tmp_path / "d.parquet")
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT range AS k, 'v' || CAST(range % 7 AS VARCHAR) AS s "
        f"FROM range(3000)) TO '{p}' (FORMAT PARQUET)")
    meta = parse_footer(open(p, "rb").read())
    assert meta[3] == 3000
    assert len(meta[4]) == pq.ParquetFile(p).metadata.num_row_groups


def test_no_embedded_blooms_in_pyarrow_files(tmp_path):
    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2, 3]}), p)
    assert read_embedded_blooms(str(p)) == []


# --------------------------------- layer 2: spec-encoded bloom fixture


def _fixture_with_bloom(tmp_path, keys: list[str]):
    """A minimal spec-shaped parquet container whose footer records one
    column with an embedded SBBF bloom over ``keys``."""
    h = bloom_mod.hash_values(keys, "string")
    bitset = bloom_mod.build(h, bloom_mod.num_blocks_for(len(keys)))
    header = _enc_struct([
        (1, 5, _zz(len(bitset))),                       # numBytes i32
        (2, 12, _enc_struct([(1, 12, _enc_struct([]))])),  # BLOCK
        (3, 12, _enc_struct([(1, 12, _enc_struct([]))])),  # XXHASH
        (4, 12, _enc_struct([(1, 12, _enc_struct([]))])),  # UNCOMPRESSED
    ])
    body = b"PAR1" + header + bitset
    bloom_off = 4
    col_meta = _enc_struct([
        (3, 9, _enc_list(8, [_enc_binary(b"doc_id")])),  # path_in_schema
        (5, 6, _zz(len(keys))),                          # num_values
        (14, 6, _zz(bloom_off)),                         # bloom offset
        (15, 5, _zz(len(header) + len(bitset))),         # bloom length
    ])
    chunk = _enc_struct([(2, 6, _zz(4)), (3, 12, col_meta)])
    rg = _enc_struct([
        (1, 9, _enc_list(12, [chunk])),
        (2, 6, _zz(len(bitset))),
        (3, 6, _zz(len(keys))),
    ])
    footer = _enc_struct([
        (1, 5, _zz(2)),                                  # version
        (2, 9, _enc_list(12, [_enc_struct([])])),        # schema (stub)
        (3, 6, _zz(len(keys))),                          # num_rows
        (4, 9, _enc_list(12, [rg])),                     # row_groups
    ])
    # header offset was computed relative to file start AFTER magic
    blob = body + footer + len(footer).to_bytes(4, "little") + b"PAR1"
    p = tmp_path / "bloomed.parquet"
    p.write_bytes(blob)
    return str(p)


def test_embedded_bloom_roundtrip_and_probe(tmp_path):
    keys = [f"doc-{i}" for i in range(500)]
    p = _fixture_with_bloom(tmp_path, keys)
    blooms = read_embedded_blooms(p)
    assert len(blooms) == 1
    b = blooms[0]
    assert b["column"] == "doc_id" and b["row_group"] == 0
    # every present key probes positive
    assert probe_embedded_bloom(b, keys, "string").all()
    # absent keys almost all probe negative (SBBF fp ≈ 1%)
    miss = probe_embedded_bloom(
        b, [f"nope-{i}" for i in range(500)], "string")
    assert miss.sum() <= 15


def test_compact_struct_scalar_types():
    # bool-true field, i64, double, binary, map
    buf = _enc_struct([
        (1, 1, b""),
        (2, 6, _zz(-12345)),
        (3, 7, np.float64(2.5).tobytes()),
        (4, 8, _enc_binary(b"xyz")),
    ])
    d, pos = compact_struct(buf, 0)
    assert d[1] is True and d[2] == -12345 and d[3] == 2.5 and d[4] == b"xyz"
    assert pos == len(buf)


def test_compact_struct_bool_list():
    """list<bool> elements are one byte each on the wire (no field
    header) — the untyped decoder must consume them, or the rest of the
    struct desyncs."""
    buf = _enc_struct([
        (1, 9, _enc_list(1, [b"\x01", b"\x02", b"\x01"])),  # spec: 1=true 2=false
        (2, 6, _zz(77)),  # field AFTER the list proves no desync
    ])
    d, pos = compact_struct(buf, 0)
    assert d[1] == [True, False, True]
    assert d[2] == 77
    assert pos == len(buf)


def test_prune_consumes_embedded_blooms(tmp_path):
    """prune_files_by_bloom falls through to spec-embedded blooms when
    no sidecar exists — the unified foreign-file consumer."""
    from parquet2_ray.sources.parquet_interop import prune_files_by_bloom

    keys = [f"doc-{i}" for i in range(200)]
    p = _fixture_with_bloom(tmp_path, keys)
    import os
    dst = tmp_path / "part-0.parquet"
    os.rename(p, dst)
    kept = prune_files_by_bloom(str(tmp_path), ["doc-7"])
    assert str(dst) in kept
    kept = prune_files_by_bloom(str(tmp_path), ["definitely-absent-xyz"])
    assert kept == []


# --------------------------- WRITE side: embed blooms into real files


def test_typed_footer_roundtrip_readable(tmp_path):
    """Decode + losslessly re-encode a pyarrow footer; the rewritten
    file must stay readable by pyarrow AND duckdb."""
    import duckdb

    from parquet2_ray.sources.parquet_bloom import (
        typed_decode_struct,
        typed_encode_struct,
    )

    tbl = pa.table({
        "k": pa.array(np.arange(4000, dtype=np.int64)),
        "s": pa.array([f"v{i % 13}" for i in range(4000)]),
    })
    src = tmp_path / "src.parquet"
    pq.write_table(tbl, src, row_group_size=1200)
    data = open(src, "rb").read()
    flen = int.from_bytes(data[-8:-4], "little")
    fields, consumed = typed_decode_struct(data[-8 - flen:-8], 0)
    assert consumed == flen
    re_enc = typed_encode_struct(fields)
    dst = tmp_path / "re.parquet"
    with open(dst, "wb") as f:
        f.write(data[:-8 - flen])
        f.write(re_enc)
        f.write(len(re_enc).to_bytes(4, "little"))
        f.write(b"PAR1")
    assert pq.read_table(dst).equals(tbl)
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()
    assert n[0] == 4000


def test_embed_blooms_cross_engine(tmp_path):
    """embed_blooms writes spec-embedded SBBF blooms; pyarrow and duckdb
    still read the patched file byte-for-byte, and our reader finds and
    probes the blooms correctly."""
    import duckdb

    from parquet2_ray.sources.parquet_bloom import (
        embed_blooms,
        probe_embedded_bloom,
        read_embedded_blooms,
    )

    tbl = pa.table({
        "doc_id": pa.array([f"doc-{i}" for i in range(3000)]),
        "n": pa.array(np.arange(3000, dtype=np.int64)),
    })
    src = tmp_path / "plain.parquet"
    pq.write_table(tbl, src, row_group_size=1000)
    dst = str(tmp_path / "bloomed.parquet")
    res = embed_blooms(str(src), dst, columns=["doc_id"])
    assert res["n_blooms"] == 3  # one per row group

    # cross-engine: both readers see identical data in the patched file
    assert pq.read_table(dst).equals(tbl)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT count(*), min(n), max(n) FROM read_parquet('{dst}')"
    ).fetchone()
    assert got == (3000, 0, 2999)

    # our reader: per-row-group blooms, correct membership
    blooms = read_embedded_blooms(dst)
    assert [b["row_group"] for b in blooms] == [0, 1, 2]
    assert all(b["column"] == "doc_id" for b in blooms)
    # rg1 holds doc-1000..doc-1999
    b1 = blooms[1]
    assert probe_embedded_bloom(b1, ["doc-1500"], "string").all()
    miss = probe_embedded_bloom(
        b1, [f"doc-{i}" for i in range(0, 500)], "string")
    assert miss.sum() <= 15  # other row groups' keys ≈ all pruned


def test_embed_blooms_then_prune(tmp_path):
    """End-to-end: pyarrow-written parts + embed_blooms → the unified
    prune consumer skips files by their embedded blooms."""
    from parquet2_ray.sources.parquet_bloom import embed_blooms
    from parquet2_ray.sources.parquet_interop import prune_files_by_bloom

    for p in range(3):
        t = pa.table({"doc_id": pa.array(
            [f"p{p}-doc-{i}" for i in range(400)])})
        raw = tmp_path / f"raw-{p}.parquet"
        pq.write_table(t, raw)
        embed_blooms(str(raw), str(tmp_path / f"part-{p}.parquet"))
        raw.unlink()
    kept = prune_files_by_bloom(str(tmp_path), ["p1-doc-7"])
    assert kept == [str(tmp_path / "part-1.parquet")]
    assert prune_files_by_bloom(str(tmp_path), ["absent-key"]) == []


@pytest.mark.parametrize("case", [
    "nested", "decimal_ts", "nulls", "compressed", "v2_nodict", "wide"])
def test_typed_footer_roundtrip_schema_zoo(tmp_path, case):
    """The lossless thrift re-encode must survive every footer shape
    pyarrow can write — nested types, decimals/timestamps, null-heavy
    columns, compressed+stats footers, v2 data pages without
    dictionaries, many-column files. A miss would corrupt any file
    embed_blooms touches."""
    import datetime
    import decimal

    import duckdb

    from parquet2_ray.sources.parquet_bloom import (
        typed_decode_struct,
        typed_encode_struct,
    )

    n = 600
    kw = {}
    if case == "nested":
        tbl = pa.table({
            "l": pa.array([[i, i + 1]] * 1 if False else [[i, None, i]
                           for i in range(n)],
                          type=pa.list_(pa.int32())),
            "s": pa.array([{"a": i, "b": [str(i)]} for i in range(n)],
                          type=pa.struct([("a", pa.int64()),
                                          ("b", pa.list_(pa.string()))])),
            "m": pa.array([[(f"k{i}", i)] for i in range(n)],
                          type=pa.map_(pa.string(), pa.int32())),
        })
    elif case == "decimal_ts":
        tbl = pa.table({
            "d": pa.array([decimal.Decimal(i) / 100 for i in range(n)],
                          type=pa.decimal128(18, 4)),
            "t": pa.array([datetime.datetime(2020, 1, 1)
                           + datetime.timedelta(seconds=i)
                           for i in range(n)], type=pa.timestamp("us")),
            "dt": pa.array([datetime.date(2020, 1, 1)] * n),
        })
    elif case == "nulls":
        tbl = pa.table({
            "x": pa.array([None if i % 3 else i for i in range(n)],
                          type=pa.int64()),
            "y": pa.array([None] * n, type=pa.string()),
        })
    elif case == "compressed":
        tbl = pa.table({"a": list(range(n)), "b": [f"v{i%7}" for i in range(n)]})
        kw = {"compression": "zstd", "row_group_size": 150}
    elif case == "v2_nodict":
        tbl = pa.table({"a": list(range(n)), "b": [f"w{i}" for i in range(n)]})
        kw = {"use_dictionary": False, "data_page_version": "2.0",
              "column_encoding": {"a": "DELTA_BINARY_PACKED",
                                  "b": "DELTA_LENGTH_BYTE_ARRAY"}}
    else:  # wide
        tbl = pa.table({f"c{i:03d}": list(range(60)) for i in range(80)})

    src = tmp_path / "z.parquet"
    pq.write_table(tbl, src, **kw)
    data = open(src, "rb").read()
    flen = int.from_bytes(data[-8:-4], "little")
    fields, consumed = typed_decode_struct(data[-8 - flen:-8], 0)
    assert consumed == flen
    re_enc = typed_encode_struct(fields)
    # decode∘encode must be a fixpoint even if byte layout could differ
    fields2, c2 = typed_decode_struct(re_enc, 0)
    assert c2 == len(re_enc) and fields2 == fields
    dst = tmp_path / "z2.parquet"
    with open(dst, "wb") as f:
        f.write(data[:-8 - flen]); f.write(re_enc)
        f.write(len(re_enc).to_bytes(4, "little")); f.write(b"PAR1")
    got = pq.read_table(dst)
    assert got.equals(tbl)
    n_rows = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    assert n_rows == tbl.num_rows
