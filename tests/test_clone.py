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


# ---------------------------------------------------------------- P60
# publish_clone: merge a clone's additions back into its source


def _doc_ids(out: str, **kw) -> set:
    ds = decode_dataset(out, columns=["doc_id"], **kw)
    got = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        got.update(b["doc_id"].to_pylist())
    return got


def _prefixed(n: int, seed: int, prefix: str) -> pa.Table:
    t = make_tokens_table(n, seed=seed)
    return t.set_column(
        t.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array([prefix] * t.num_rows), t["doc_id"], ""))


def test_publish_merges_additions(src_container, tmp_path):
    from parquet2_ray.pipelines.clone_pipeline import publish_clone
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    inc = _prefixed(60, 5, "exp/")
    p = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p)
    append_dataset(p, dst, OPTS)
    # the SOURCE advanced independently meanwhile
    p2 = str(tmp_path / "srcinc.parquet")
    pq.write_table(_prefixed(40, 6, "live/"), p2)
    append_dataset(p2, src, OPTS)

    before_clone = _doc_ids(dst)
    s = publish_clone(dst, fsync=False)
    assert s["merged"] >= 1 and not s.get("noop")
    assert _doc_ids(src) >= set(inc["doc_id"].to_pylist())
    assert any(i.startswith("live/") for i in _doc_ids(src))
    # source owns the merged bytes: real files, verify green
    assert verify_manifest(src)["n_bad"] == 0
    h = container_history(src)
    assert [e["op"] for e in h][-1] == "merge"
    # clone untouched by the publish
    assert _doc_ids(dst) == before_clone
    # time travel: before the merge txn, additions are absent
    assert not any(i.startswith("exp/")
                   for i in _doc_ids(src, as_of=s["txn"] - 1))


def test_publish_refuses_shared_rewrite(src_container, tmp_path):
    from parquet2_ray.pipelines.clone_pipeline import publish_clone

    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    d = delete_rows(dst, "n_tok", lo=3000, hi=None, fsync=False)
    assert d["n_touched"] > 0
    with pytest.raises(RuntimeError, match="rewrote or deleted shared"):
        publish_clone(dst, fsync=False)


def test_publish_idempotent_and_noop(src_container, tmp_path):
    from parquet2_ray.pipelines.clone_pipeline import publish_clone

    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    # nothing added yet: noop, no txn consumed
    s0 = publish_clone(dst, fsync=False)
    assert s0.get("noop") and s0["merged"] == 0
    inc = _prefixed(50, 7, "exp/")
    p = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p)
    append_dataset(p, dst, OPTS)
    s1 = publish_clone(dst, fsync=False)
    n_after = len(mf.load_manifest(src))
    s2 = publish_clone(dst, fsync=False)     # re-publish: one logical merge
    assert s2.get("noop") and s2["txn"] == s1["txn"]
    assert len(mf.load_manifest(src)) == n_after
    exp = [i for i in _doc_ids(src) if i.startswith("exp/")]
    assert sorted(exp) == sorted(inc["doc_id"].to_pylist())


def test_publish_crash_before_marker_resumes(src_container, tmp_path,
                                             monkeypatch):
    from parquet2_ray.pipelines import clone_pipeline
    from parquet2_ray.pipelines.clone_pipeline import publish_clone

    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    inc = _prefixed(40, 8, "exp/")
    p = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p)
    append_dataset(p, dst, OPTS)
    src_ids = _doc_ids(src)

    real = mf.commit_family

    def boom(*a, **kw):
        raise OSError("injected crash before merge marker")

    monkeypatch.setattr(clone_pipeline.mf, "commit_family", boom)
    with pytest.raises(OSError, match="injected"):
        publish_clone(dst, fsync=False)
    # staged records are invisible: source bit-identical
    assert _doc_ids(src) == src_ids
    monkeypatch.setattr(clone_pipeline.mf, "commit_family", real)
    s = publish_clone(dst, fsync=False)
    assert not s.get("noop")
    assert {i for i in _doc_ids(src) if i.startswith("exp/")} == set(
        inc["doc_id"].to_pylist())


def test_publish_link_mode_zero_copy(src_container, tmp_path):
    from parquet2_ray.pipelines.clone_pipeline import publish_clone
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    inc = _prefixed(30, 9, "exp/")
    p = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p)
    append_dataset(p, dst, OPTS)
    n_src_files = len(_files(src))
    s = publish_clone(dst, fsync=False, link=True)
    assert s["link"] and s["merged"] >= 1
    # zero bytes copied into the source dir
    assert len(_files(src)) == n_src_files
    assert {i for i in _doc_ids(src) if i.startswith("exp/")} == set(
        inc["doc_id"].to_pylist())
    # a source sweep must never delete the clone's files
    clone_files = _files(dst)
    sweep_invisible(src)
    assert _files(dst) == clone_files
    assert verify_manifest(src)["n_bad"] == 0


def test_publish_cli(src_container, tmp_path, capsys):
    import json as _json

    from parquet2_ray.job import main

    src, _ = src_container
    dst = str(tmp_path / "br")
    clone_container(src, dst)
    inc = _prefixed(20, 10, "exp/")
    p = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p)
    append_dataset(p, dst, OPTS)
    assert main(["publish", "--clone", dst]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["merged"] >= 1 and out["src"] == src
