"""P57 shallow clone (``clone_container``): O(metadata) container
branch over shared data files.

Pins the three contracts that make a clone safe: (1) zero data bytes
copied, reads bit-equal; (2) full maintenance divergence — the clone
mutates independently while the source is provably untouched; (3) no
clone-side GC/rollback can ever delete a shared source file (external
records reclaim their manifest JSON only).

No reference analog; the shape is Delta Lake's SHALLOW CLONE,
expressed in the container's record algebra (see clone_pipeline.py).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.clone_pipeline import clone_container
from parquet2_ray.pipelines.compact_pipeline import sweep_invisible
from parquet2_ray.pipelines.delete_pipeline import delete_rows
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.history_pipeline import (
    container_history,
    rollback_container,
    tag_snapshot,
)
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf

OPTS = EncodeOptions(target_weight=50_000, fsync=False)


def _rows(out: str, **kw) -> list[dict]:
    ds = decode_dataset(out, **kw)
    rows = [r for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    return sorted(rows, key=lambda r: r["doc_id"])


def _files(d: str) -> dict[str, float]:
    return {p: os.path.getmtime(p)
            for p in glob.glob(os.path.join(d, "part-*.bin"))}


@pytest.fixture()
def src_container(ray_session, tmp_path):
    out = str(tmp_path / "src")
    p0 = str(tmp_path / "s.parquet")
    pq.write_table(make_tokens_table(200, seed=1), p0)
    encode_dataset(p0, out, OPTS)
    return out, p0


def test_clone_is_metadata_only_and_reads_equal(src_container, tmp_path):
    src, _ = src_container
    dst = str(tmp_path / "br")
    s = clone_container(src, dst)
    assert s["n_rows"] == 200
    # zero data files in the clone dir — metadata only
    assert glob.glob(os.path.join(dst, "part-*.bin")) == []
    assert _rows(dst) == _rows(src)
    # projection + pruning machinery inherits unchanged
    few = decode_dataset(dst, columns=["doc_id", "n_tok"],
                         key_range=("n_tok", 0, 1000)).to_pandas()
    assert set(few.columns) == {"doc_id", "n_tok"}
    assert (few.n_tok <= 1000).all()


def test_clone_diverges_and_source_is_untouched(src_container, tmp_path):
    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    before = _files(src)
    src_rows = _rows(src)
    # mutate the BRANCH: delete + append
    d = delete_rows(dst, "n_tok", lo=3500, hi=None, fsync=False)
    assert d["n_deleted"] > 0
    p1 = str(tmp_path / "i.parquet")
    pq.write_table(make_tokens_table(50, seed=2), p1)
    append_dataset(p1, dst, OPTS)
    # branch changed; append ids allocated past the cloned records
    assert len(_rows(dst)) == 200 - d["n_deleted"] + 50
    assert [(e["txn"], e["op"]) for e in container_history(dst)] == [
        (0, "clone"), (1, "delete"), (2, "append")]
    # source: same files (mtimes), same rows
    assert _files(src) == before
    assert _rows(src) == src_rows
    # the branch's rewrite landed INSIDE the branch dir
    assert glob.glob(os.path.join(dst, "part-*.bin"))


def test_clone_gc_never_deletes_source_files(src_container, tmp_path):
    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    before = _files(src)
    delete_rows(dst, "n_tok", lo=0, hi=2000, fsync=False)
    # the delete hid some EXTERNAL records; a plain sweep must reclaim
    # their manifest JSONs but never the shared source bytes
    swept = sweep_invisible(dst)
    assert swept > 0
    assert _files(src) == before
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(src)["n_bad"] == 0
    assert verify_manifest(dst)["n_bad"] == 0


def test_clone_rollback_spares_external_files(src_container, tmp_path):
    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    before = _files(src)
    base_rows = _rows(dst)
    delete_rows(dst, "n_tok", lo=3500, hi=None, fsync=False)
    rollback_container(dst, 0)
    assert _rows(dst) == base_rows
    assert _files(src) == before


def test_clone_as_of_snapshot(src_container, tmp_path):
    src, _ = src_container
    p1 = str(tmp_path / "i.parquet")
    pq.write_table(make_tokens_table(30, seed=3), p1)
    append_dataset(p1, src, OPTS)
    tag_snapshot(src, "v0", txn=0)
    dst = str(tmp_path / "old")
    s = clone_container(src, dst, as_of="v0")
    assert s["n_rows"] == 200
    assert _rows(dst) == _rows(src, as_of=0)


def test_clone_of_clone_and_validation(src_container, tmp_path):
    src, _ = src_container
    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    clone_container(src, b1)
    clone_container(b1, b2)  # transitively external
    assert _rows(b2) == _rows(src)
    recs = mf.load_manifest(b2)
    assert all(r.get("external") for r in recs.values())
    with pytest.raises(ValueError):
        clone_container(src, src)
    with pytest.raises(FileExistsError):
        clone_container(src, b1)


def test_cli_clone_e2e(ray_session, tmp_path, capsys):
    import json

    from parquet2_ray.job import main

    p0 = str(tmp_path / "s.parquet")
    pq.write_table(make_tokens_table(100, seed=4), p0)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    assert main(["encode", "--input", p0, "--output", src,
                 "--target-weight", "50000"]) == 0
    capsys.readouterr()
    assert main(["clone", "--src", src, "--dst", dst]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] == 100
    assert main(["verify", "--container", dst]) == 0
    ver = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ver["n_bad"] == 0
