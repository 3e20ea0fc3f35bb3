"""Hadoop-framed LZ4 sniffing (state/lz4_legacy.py) — the engine-side
analog of reference compression.rs:195-198/231-287 and its
tests/it/read/lz4_legacy.rs:30-55 inference test.

parquet-testing's binary fixtures aren't available offline, so the
fixtures here are produced by the SAME writer lineage: Arrow C++'s
``Lz4HadoopCodec`` via ``pq.write_table(compression="LZ4")`` (the real
legacy-LZ4 parquet producer in this environment), plus hand-framed
payloads for the multi-frame and failure branches.
"""

from __future__ import annotations

import io
import json
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet2_ray.codecs.column import decode_array, encode_array
from parquet2_ray.sources.parquet_bloom import compact_struct
from parquet2_ray.state import manifest as mf
from parquet2_ray.state.lz4_legacy import (
    compress_hadoop_lz4,
    decompress_hadoop_lz4,
    decompress_lz4_any,
)


def _payload(rng, n=200_000) -> bytes:
    # compressible: low-entropy byte stream
    return rng.integers(0, 7, n, dtype=np.uint8).tobytes()


def test_hadoop_multi_frame_roundtrip(rng):
    data = _payload(rng)
    framed = compress_hadoop_lz4(data, frame_size=16 * 1024)  # ≥12 frames
    assert framed[:4] == struct.pack(">I", 16 * 1024)
    assert decompress_hadoop_lz4(framed, len(data)) == data
    assert decompress_lz4_any(framed, len(data)) == data


def test_any_decodes_frame_format_and_bare_block(rng):
    data = _payload(rng)
    frame = pa.Codec("lz4").compress(data, asbytes=True)
    block = pa.Codec("lz4_raw").compress(data, asbytes=True)
    assert decompress_lz4_any(frame, len(data)) == data
    assert decompress_lz4_any(block, len(data)) == data


def test_hadoop_rejects_non_hadoop_payloads(rng):
    data = _payload(rng)
    for buf in (pa.Codec("lz4").compress(data, asbytes=True),
                pa.Codec("lz4_raw").compress(data, asbytes=True),
                compress_hadoop_lz4(data)[:-3]):  # truncated last frame
        with pytest.raises(ValueError):
            decompress_hadoop_lz4(buf, len(data))


def test_real_lz4_page_inference_both_framings(rng):
    """The lz4_legacy.rs:30-55 inference analog on a REAL page: a
    parquet file written with the legacy ``LZ4`` codec id (Arrow 16
    emits the bare-block variant — parquet-testing's
    ``non_hadoop_lz4_compressed.parquet`` shape), its first data page
    located via pyarrow metadata and its thrift PageHeader parsed with
    this repo's compact decoder.  ``decompress_lz4_any`` must decode
    BOTH the bare-block page and the same page re-framed with the
    Hadoop Lz4Codec layout, without being told which is which."""
    vals = np.arange(5000, dtype=np.int64) % 911
    t = pa.table({"a": pa.array(vals)})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="LZ4", use_dictionary=False,
                   column_encoding="PLAIN", write_statistics=False,
                   data_page_version="1.0")
    raw = buf.getvalue()
    meta = pq.ParquetFile(io.BytesIO(raw)).metadata.row_group(0).column(0)
    assert meta.compression == "LZ4"
    off = meta.data_page_offset
    # thrift compact PageHeader: 2 = uncompressed_page_size,
    # 3 = compressed_page_size (parquet-format spec)
    hdr, end = compact_struct(raw, off)
    usize, csize = hdr[2], hdr[3]
    page = raw[end:end + csize]
    out = decompress_lz4_any(page, usize)         # bare-block arm
    assert len(out) == usize
    # PLAIN int64 page body ends with the values themselves
    got = np.frombuffer(out[-vals.nbytes:], dtype=np.int64)
    assert np.array_equal(got, vals)
    hadoop_page = compress_hadoop_lz4(out)        # hadoop arm, same content
    assert decompress_lz4_any(hadoop_page, usize) == out
    # and the full-file ingest path agrees with the source table
    assert pq.read_table(io.BytesIO(raw)).equals(t)


def test_container_from_foreign_hadoop_producer(tmp_path, rng):
    """A container whose lz4 payloads use the Hadoop framing (foreign
    producer on the legacy codec id) must read back identically — the
    read path sniffs per payload, exactly like the reference."""
    ints = pa.array(rng.integers(0, 1000, 5000), type=pa.int64())
    strs = pa.array([f"doc-{i % 97:05d}" for i in range(5000)])
    cols = [encode_array("k", ints, "delta_binary_packed"),
            encode_array("s", strs, "dict_binary")]
    path = str(tmp_path / "native.bin")
    mf.write_partition_file(path, cols, 5000)   # uncompressed layout
    blob = open(path, "rb").read()
    flen = int.from_bytes(blob[-8:-4], "little")
    footer = json.loads(blob[-8 - flen:-8])
    body = bytearray()
    for m in footer["columns"]:
        payload = blob[m["offset"]:m["offset"] + m["size"]]
        framed = compress_hadoop_lz4(payload, frame_size=4 * 1024)
        m["meta"]["compression"] = "lz4"
        m["meta"]["uncompressed_size"] = len(payload)
        m["offset"] = len(body)
        m["size"] = len(framed)
        body += framed
    fb = json.dumps(footer, separators=(",", ":")).encode()
    foreign = str(tmp_path / "foreign.bin")
    with open(foreign, "wb") as f:
        f.write(bytes(body) + fb + len(fb).to_bytes(4, "little") + mf.MAGIC)
    _, read_cols = mf.read_partition_file(foreign)
    assert decode_array(read_cols[0]).equals(ints)
    assert decode_array(read_cols[1]).equals(strs)
