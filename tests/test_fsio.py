"""fs-generic container I/O (state/fsio.py): the OUTPUT-side twin of
the object-store input resolution (sources/readers.py).  mock:// is
pyarrow's in-memory filesystem — URI-reachable and genuinely
non-local, so every non-local branch (atomic PUT, random-access
open_input_file, FileSelector listing, exists probe) runs for real."""

import numpy as np
import pyarrow as pa
import pytest

from parquet2_ray.state import fsio
from parquet2_ray.state import manifest as mf


def test_resolve_local_and_file_uri(tmp_path):
    f, p = fsio.resolve(str(tmp_path / "x.bin"))
    assert f is None and p.endswith("x.bin")
    f, p = fsio.resolve(f"file://{tmp_path}/y.bin")
    assert f is None and p == f"{tmp_path}/y.bin"


def test_fsio_helpers_roundtrip_mock():
    base = "mock://zoo/out"
    fsio.ensure_dir(base)
    fsio.atomic_write(f"{base}/a.bin", b"hello-fsio")
    assert fsio.exists(f"{base}/a.bin")
    assert not fsio.exists(f"{base}/missing.bin")
    assert fsio.read_bytes(f"{base}/a.bin") == b"hello-fsio"
    fh, size = fsio.open_input(f"{base}/a.bin")
    try:
        assert size == 10
        fh.seek(6)
        assert fh.read(4) == b"fsio"
    finally:
        fh.close()
    assert fsio.listdir(base) == ["a.bin"]
    assert fsio.listdir(f"{base}/nonexistent") == []


def test_container_layer_on_mock_uri():
    """Whole container lifecycle against an object-store-style URI:
    encode partition → manifest record → O(1) resume probe → footer /
    blocks / full reads → global manifest → bit-identical decode."""
    from parquet2_ray.sources.tokens import make_tokens_table
    from parquet2_ray.stages.encode import (
        decode_partition_path,
        encode_partition_table,
    )

    out = "mock://bucket/container"
    fsio.ensure_dir(out)
    tbl = make_tokens_table(800, seed=21)
    rec = encode_partition_table(tbl, out, sort_key="doc_id",
                                 weight_col="n_tok", fsync=False)
    path = rec["path"][0].as_py()
    assert path.startswith("mock://")
    assert rec["skipped"][0].as_py() is False

    # manifest written + readable through the same URI space
    records = mf.load_manifest(out)
    assert len(records) == 1
    pid = rec["part_id"][0].as_py()
    assert mf.load_manifest_record(out, pid)["fingerprint"] == \
        rec["fingerprint"][0].as_py()

    # resume: identical re-encode is skipped via the fs exists probe
    rec2 = encode_partition_table(tbl, out, sort_key="doc_id",
                                  weight_col="n_tok", fsync=False)
    assert rec2["skipped"][0].as_py() is True

    # reads: footer, single-block read, and the pread block reader
    footer = mf.read_partition_footer(path)
    assert footer["num_rows"] == 800
    _, cols = mf.read_partition_file(path)
    assert {c.name for c in cols} == set(tbl.column_names)
    _, blocks, nbytes = mf.read_partition_blocks(path, columns=["n_tok"])
    assert len(blocks) == 1 and nbytes > 0
    row_start, n_rows, bcols = blocks[0]
    assert (row_start, n_rows) == (0, 800) and bcols[0].name == "n_tok"

    # full decode is bit-identical to the canonicalized input
    dec = decode_partition_path(path)
    ref = tbl.sort_by("doc_id").combine_chunks()
    assert dec.select(ref.column_names).cast(ref.schema).equals(ref)

    mf.write_global_manifest(out, {"n_partitions": 1})
    assert b"n_partitions" in fsio.read_bytes(f"{out}/_MANIFEST.json")


def test_fsio_delete_local_and_mock(tmp_path):
    # local
    p = str(tmp_path / "d.bin")
    fsio.atomic_write(p, b"x")
    fsio.delete(p)
    assert not fsio.exists(p)
    fsio.delete(p)                       # idempotent: missing_ok
    with pytest.raises(FileNotFoundError):
        fsio.delete(p, missing_ok=False)
    # object-store route
    m = "mock://zoo/del/a.bin"
    fsio.ensure_dir("mock://zoo/del")
    fsio.atomic_write(m, b"y")
    assert fsio.exists(m)
    fsio.delete(m)
    assert not fsio.exists(m)
    fsio.delete(m)                       # idempotent on mock too
