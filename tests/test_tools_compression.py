"""Block compression (SURVEY.md C1-C4) and the parquet-tools analog (S14)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet2_ray.codecs.column import EncodedColumn, decode_array, encode_array
from parquet2_ray.state import manifest as mf


def _cols(rng):
    ints = pa.array(rng.integers(0, 1000, 5000), type=pa.int64())
    strs = pa.array([f"doc-{i % 97:05d}" for i in range(5000)])
    return [
        encode_array("k", ints, "delta_binary_packed"),
        encode_array("s", strs, "dict_binary"),
    ], ints, strs


@pytest.mark.parametrize("compression", ["zstd", "lz4", "gzip", "snappy", "brotli"])
def test_partition_file_compression_roundtrip(tmp_path, rng, compression):
    cols, ints, strs = _cols(rng)
    path = str(tmp_path / "part.bin")
    total = mf.write_partition_file(path, cols, 5000, compression=compression)
    footer, read_cols = mf.read_partition_file(path)
    assert footer["num_rows"] == 5000
    assert decode_array(read_cols[0]).equals(ints)
    assert decode_array(read_cols[1]).equals(strs)
    # compressed container must not exceed the uncompressed one
    path_u = str(tmp_path / "part_u.bin")
    total_u = mf.write_partition_file(path_u, cols, 5000)
    assert total <= total_u


def test_compression_skipped_when_not_smaller(tmp_path, rng):
    # incompressible payload: already-dense random bytes under dict codec
    payload = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    col = EncodedColumn(name="b", codec="raw-test", arrow_type="binary",
                        num_values=1, payload=payload)
    path = str(tmp_path / "p.bin")
    mf.write_partition_file(path, [col], 1, compression="zstd")
    footer, cols = mf.read_partition_file(path)
    assert cols[0].payload == payload
    assert "compression" not in footer["columns"][0]["meta"]


def test_unknown_compression_rejected(tmp_path, rng):
    cols, _, _ = _cols(rng)
    with pytest.raises(ValueError, match="unknown compression"):
        mf.write_partition_file(str(tmp_path / "x.bin"), cols, 5000,
                                compression="xz")


@pytest.mark.usefixtures("ray_session")
def test_tools_cli(tmp_path, capsys):
    import pyarrow.parquet as pq

    from parquet2_ray import tools
    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    pq.write_table(make_tokens_table(1000, seed=3), src)
    out = str(tmp_path / "enc")
    s = encode_dataset(str(src), out, EncodeOptions(target_weight=100_000))

    assert tools.rowcount(out) == 1000
    m = tools.meta(out)
    assert m["n_rows"] == 1000
    assert m["n_partitions"] == s["n_partitions"]
    assert all(p["codecs"] for p in m["partitions"])
    rows = tools.dump(out, limit=5)
    assert len(rows) == 5 and "doc_id" in rows[0]

    tools.main(["rowcount", out])
    assert capsys.readouterr().out.strip() == "1000"

    # layout: doc_id is the per-partition sort key but partitioning is
    # (source, n_tok-range) → doc_id overlaps; n_tok's factor is small
    lay = tools.layout(out)
    assert lay["n_partitions"] == s["n_partitions"]
    assert set(lay["columns"]) >= {"doc_id", "n_tok", "source"}
    assert lay["columns"]["n_tok"]["overlap_factor"] >= 1.0
    lay2 = tools.layout(out, ["n_tok"])
    assert list(lay2["columns"]) == ["n_tok"]
    tools.main(["layout", out, "--columns", "n_tok"])
    import json as _json
    assert "n_tok" in _json.loads(capsys.readouterr().out)["columns"]


def test_tools_metrics(ray_session, tokens_table, tmp_path, capsys):
    import pyarrow.parquet as pq

    from parquet2_ray import tools
    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset

    src = tmp_path / "src.parquet"
    pq.write_table(tokens_table, src)
    out = str(tmp_path / "enc")
    encode_dataset(str(src), out, EncodeOptions(target_weight=100_000))
    m = tools.metrics(out)
    assert m["n_partitions"] > 0
    assert m["n_rows"] > 0
    assert m["encoded_bytes"] > 0
    assert m["compression_ratio"] > 1.0
    assert "skipped_partitions" not in m
    assert m["encode_core_s"] > 0
    assert set(m["phase_core_s"]) >= {"encode_s", "select_s", "write_s"}
    tools.main(["metrics", out])
    out = capsys.readouterr().out
    import json
    assert json.loads(out)["n_rows"] == m["n_rows"]


# ---- compression levels (reference parquet_bridge.rs:100-258) ----

def test_parse_compression_specs():
    codec, name = mf.parse_compression("zstd:19")
    assert name == "zstd" and codec is not None
    assert mf.parse_compression(None) == (None, None)
    assert mf.parse_compression("snappy")[1] == "snappy"
    with pytest.raises(ValueError, match="does not take"):
        mf.parse_compression("snappy:2")
    with pytest.raises(ValueError, match="outside supported range"):
        mf.parse_compression("gzip:99")
    with pytest.raises(ValueError, match="unknown compression"):
        mf.parse_compression("xz:3")


def test_leveled_compression_roundtrip_and_size(tmp_path):
    # compressible text payload where zstd levels genuinely differ
    text = pa.array([f"the quick brown fox {i % 11} jumps over the lazy dog"
                     for i in range(20000)])
    cols = [encode_array("t", text, "plain_byte_array")]
    sizes = {}
    for spec in ["zstd:1", "zstd:19"]:
        path = str(tmp_path / f"p_{spec.replace(':', '_')}.bin")
        sizes[spec] = mf.write_partition_file(path, cols, len(text),
                                              compression=spec)
        footer, read_cols = mf.read_partition_file(path)
        # the level stays write-side: meta carries only the bare codec
        assert footer["columns"][0]["meta"]["compression"] == "zstd"
        assert decode_array(read_cols[0]).equals(text)
    assert sizes["zstd:19"] < sizes["zstd:1"]


def test_selector_prices_with_leveled_codec():
    from parquet2_ray.functions.selector import select_codec

    vals = pa.array([float(i % 100) for i in range(5000)])
    # must not raise on a spec string; same decision space as bare name
    assert select_codec(vals, compression="zstd:6") in (
        "byte_stream_split", "dict_rle", "for_bitpack", "plain",
        "delta_binary_packed", "rle")


def test_tools_stats_no_decode(ray_session, tokens_table, tmp_path, capsys):
    """Statistics-only aggregates fold lineage profiles — verified
    against a real scan, computed without reading any data file."""
    import json as _json

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet2_ray import tools
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )

    src = tmp_path / "src.parquet"
    pq.write_table(tokens_table, src)
    out = str(tmp_path / "enc")
    encode_dataset(str(src), out, EncodeOptions(target_weight=100_000))

    # corrupt every data file: stats must still answer (manifest-only)
    import glob
    import os
    for f in glob.glob(os.path.join(out, "part-*.bin")):
        with open(f, "r+b") as fh:
            fh.write(b"\0" * 16)

    st = tools.stats(out)
    assert st["n_rows"] == tokens_table.num_rows
    assert st["weight_sum"] == pc.sum(tokens_table["n_tok"]).as_py()
    prof = st["columns"]["n_tok"]
    assert prof["min"] == pc.min(tokens_table["n_tok"]).as_py()
    assert prof["max"] == pc.max(tokens_table["n_tok"]).as_py()
    assert prof["n_values"] == tokens_table.num_rows
    dprof = st["columns"]["doc_id"]
    assert dprof["min"] == pc.min(tokens_table["doc_id"]).as_py()

    # projection + CLI route
    st2 = tools.stats(out, ["n_tok"])
    assert list(st2["columns"]) == ["n_tok"]
    tools.main(["stats", out, "--columns", "n_tok,doc_id"])
    got = _json.loads(capsys.readouterr().out)
    assert set(got["columns"]) == {"n_tok", "doc_id"}
