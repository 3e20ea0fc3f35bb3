"""Deletion vectors (P62, merge-on-read deletes): a delete commits a
tiny keep-bitmap sidecar over the base partition instead of a rewrite.
Covers: decode equality vs rewrite mode, base files bit-untouched,
sidecar size bound, mask composition on repeated deletes (one-level
resolve invariant), time travel across a dv delete, sweep keeping
referenced bases alive (and reclaiming them after compaction folds the
mask), paged bases under projection + predicate + block-range decode,
verify, CDC, datasource reads, full-delete tombstone fallback, CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.compact_pipeline import (
    compact_container,
    sweep_invisible,
)
from parquet2_ray.pipelines.delete_pipeline import delete_rows
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.verify_pipeline import verify_manifest
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.stages.encode import (
    decode_partition_path,
    encode_partition_table,
)
from parquet2_ray.state import manifest as mf


def _decode_all(out: str, **kw) -> pa.Table:
    tabs = [pa.Table.from_pandas(b) for b in
            decode_dataset(out, **kw).iter_batches(batch_format="pandas")]
    if not tabs:
        return make_tokens_table(1, seed=0).slice(0, 0)
    return pa.concat_tables(tabs, promote_options="permissive")


def _sorted_pd(t: pa.Table):
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["tokens"] = df["tokens"].map(tuple)
    return df


def _file_sig(path: str):
    st = os.stat(path)
    return st.st_size, st.st_mtime_ns


@pytest.fixture()
def container(ray_session, tmp_path):
    t = make_tokens_table(900, seed=47)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, EncodeOptions(target_weight=40_000,
                                           fsync=False))
    return out, t


def test_dv_delete_matches_filter_and_keeps_bases(container):
    out, t = container
    before = {r["path"]: _file_sig(r["path"])
              for r in mf.load_manifest(out).values()}
    s = delete_rows(out, "n_tok", lo=6000, hi=None, fsync=False,
                    mode="dv")
    want = t.filter(pc.less(t["n_tok"], 6000))
    assert s["n_deleted"] == t.num_rows - want.num_rows
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])
    # every pre-existing data file is bit-untouched (merge-on-read:
    # the delete wrote only NEW sidecars)
    for path, sig in before.items():
        assert _file_sig(path) == sig
    after = mf.load_manifest(out)
    dv_recs = [r for r in after.values() if r.get("dv_base")]
    assert dv_recs, "dv mode committed no deletion-vector records"
    for r in dv_recs:
        # sidecar is a bitmap, orders of magnitude under the base
        assert r["encoded_bytes"] < r["base_encoded_bytes"] / 4
        assert r["op"] == "delete"
        assert r["n_rows"] == decode_partition_path(r["path"]).num_rows
    assert verify_manifest(out)["n_bad"] == 0


def test_dv_composes_one_level(container):
    out, t = container
    delete_rows(out, "n_tok", lo=7000, hi=None, fsync=False, mode="dv")
    delete_rows(out, "n_tok", lo=5000, hi=6999, fsync=False, mode="dv")
    want = t.filter(pc.less(t["n_tok"], 5000))
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])
    # composed at write time: every dv record points at a REAL base
    for r in mf.load_manifest(out).values():
        if r.get("dv_base"):
            base_footer = mf.read_partition_footer(
                r["dv_base"], resolve_dv=False)
            assert "dv_base" not in base_footer
    assert verify_manifest(out)["n_bad"] == 0


def test_dv_time_travel_and_cdc(container):
    out, t = container
    from parquet2_ray.pipelines.history_pipeline import row_changes

    pre = max(mf.record_txn(r) for r in mf.load_manifest(out).values())
    s = delete_rows(out, "n_tok", lo=6500, hi=None, fsync=False,
                    mode="dv")
    post = max(mf.record_txn(r) for r in mf.load_manifest(out).values())
    # snapshot BEFORE the dv delete still serves every original row
    old = _sorted_pd(_decode_all(out, as_of=pre))
    assert old.equals(_sorted_pd(t)[old.columns])
    # the CDC feed across the dv window is exactly the deleted rows
    feed = pa.concat_tables(
        [pa.Table.from_pandas(b) for b in row_changes(
            out, pre, key="doc_id",
            to_txn=post).iter_batches(batch_format="pandas")],
        promote_options="permissive")
    assert set(feed["_change_type"].to_pylist()) == {"delete"}
    assert feed.num_rows == s["n_deleted"]


def test_sweep_keeps_dv_bases_until_compacted(container):
    out, t = container
    delete_rows(out, "n_tok", lo=6000, hi=None, fsync=False, mode="dv")
    dv_recs = [r for r in mf.load_manifest(out).values()
               if r.get("dv_base")]
    bases = {r["dv_base"] for r in dv_recs}
    assert bases
    sweep_invisible(out)   # collapse history to the current snapshot
    # the replaced base RECORDS are gone, but every referenced base
    # FILE survives — decode + verify stay green
    for b in bases:
        assert os.path.exists(b)
    raw, _ = mf.load_raw_records(out)
    assert not any(os.path.basename(r["path"]) ==
                   os.path.basename(b)
                   for b in bases for r in raw.values()
                   if not r.get("dv_base"))
    assert verify_manifest(out)["n_bad"] == 0
    want = t.filter(pc.less(t["n_tok"], 6000))
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])
    # compaction folds the masks into real rewrites; the next sweep
    # reclaims both the sidecars and the bases
    compact_container(out, fsync=False)
    sweep_invisible(out)
    assert not any(os.path.exists(b) for b in bases)
    assert not any(r.get("dv_base")
                   for r in mf.load_manifest(out).values())
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])
    assert verify_manifest(out)["n_bad"] == 0


def test_dv_full_delete_falls_back_to_tombstone(ray_session, tmp_path):
    t = make_tokens_table(300, seed=9)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, EncodeOptions(target_weight=30_000,
                                           fsync=False))
    delete_rows(out, "n_tok", lo=0, hi=None, fsync=False, mode="dv")
    recs = mf.load_manifest(out).values()
    assert all(r["n_rows"] == 0 for r in recs)
    # full deletes re-encode as empty tombstones, never as an all-zero
    # mask pinning the whole base file
    assert not any(r.get("dv_base") for r in recs)
    assert _decode_all(out).num_rows == 0


def test_dv_zero_match_commits_nothing(container):
    out, t = container
    before = set(mf.load_manifest(out))
    # stats-overlapping range that matches no row: n_tok is int, so a
    # fractional band inside the span touches stats but zero rows
    lo = int(pc.min(t["n_tok"]).as_py())
    s = delete_rows(out, "doc_id",
                    values=["no-such-doc-id"], fsync=False, mode="dv")
    assert s["n_deleted"] == 0
    assert set(mf.load_manifest(out)) == before
    assert lo >= 0


def test_dv_paged_base_projection_and_preds(ray_session, tmp_path):
    t = make_tokens_table(4000, seed=5)
    out = str(tmp_path / "paged")
    os.makedirs(out)
    encode_partition_table(t, out, sort_key="doc_id",
                           weight_col="n_tok", rows_per_block=512,
                           fsync=False)
    delete_rows(out, "n_tok", lo=6000, hi=None, fsync=False, mode="dv")
    want = t.filter(pc.less(t["n_tok"], 6000)).sort_by("doc_id")
    rec = next(r for r in mf.load_manifest(out).values()
               if r.get("dv_base"))
    # full decode equality
    full = decode_partition_path(rec["path"])
    assert full.sort_by("doc_id").equals(want.select(full.column_names))
    # projection decodes only the named chunks, mask still applies
    proj = decode_partition_path(rec["path"], columns=["doc_id", "n_tok"])
    assert proj.num_rows == want.num_rows
    assert proj.column_names == ["doc_id", "n_tok"]
    assert pc.max(proj["n_tok"]).as_py() < 6000
    # block-range slices partition the masked rows exactly once
    footer = mf.read_partition_footer(rec["path"])
    nb = len(footer["blocks"])
    assert nb > 1
    mid = nb // 2
    a = decode_partition_path(rec["path"], block_range=(0, mid))
    b = decode_partition_path(rec["path"], block_range=(mid, nb))
    assert a.num_rows + b.num_rows == want.num_rows
    # predicate pushdown over the base page index composes with the mask
    keys = want["doc_id"].to_pylist()
    klo, khi = keys[10], keys[20]
    pred = decode_partition_path(rec["path"], "doc_id", klo, khi)
    exact = pred.filter(
        pc.and_(pc.greater_equal(pred["doc_id"], klo),
                pc.less_equal(pred["doc_id"], khi)))
    brute = want.filter(
        pc.and_(pc.greater_equal(want["doc_id"], klo),
                pc.less_equal(want["doc_id"], khi)))
    assert exact.sort_by("doc_id").equals(
        brute.sort_by("doc_id").select(exact.column_names))


def test_dv_datasource_read(container):
    import ray

    from parquet2_ray.sources.datasource import P2RDatasource

    out, t = container
    delete_rows(out, "n_tok", lo=6000, hi=None, fsync=False, mode="dv")
    want = t.filter(pc.less(t["n_tok"], 6000))
    ds = ray.data.read_datasource(P2RDatasource(out), parallelism=64)
    got = pa.concat_tables(
        [pa.Table.from_pandas(b) for b in
         ds.iter_batches(batch_format="pandas")],
        promote_options="permissive")
    got = _sorted_pd(got)
    assert got.equals(_sorted_pd(want)[got.columns])


def test_dv_cli(container):
    out, t = container
    r = subprocess.run(
        [sys.executable, "-m", "parquet2_ray.job", "delete",
         "--container", out, "--column", "n_tok",
         "--lo", "6000", "--mode", "dv"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.splitlines()[-1])
    want = t.filter(pc.less(t["n_tok"], 6000))
    assert summary["n_deleted"] == t.num_rows - want.num_rows
    assert _decode_all(out).num_rows == want.num_rows


@pytest.mark.parametrize("link", [False, True])
def test_dv_publish_clone(ray_session, tmp_path, link):
    """A clone that dv-deleted from its OWN additions must publish a
    correct masked view: copy mode folds the mask into a real source-
    owned partition (a byte-copied sidecar would resolve its base
    against the source dir); link mode resolves the base against the
    clone dir via the absolute sidecar path."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.clone_pipeline import (
        clone_container,
        publish_clone,
    )

    src = str(tmp_path / "src")
    p0 = str(tmp_path / "s.parquet")
    pq.write_table(make_tokens_table(200, seed=1), p0)
    encode_dataset(p0, src, EncodeOptions(target_weight=50_000,
                                          fsync=False))
    br = str(tmp_path / "br")
    clone_container(src, br)
    inc = make_tokens_table(80, seed=77)
    inc = inc.set_column(
        inc.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array(["exp/"] * inc.num_rows), inc["doc_id"], ""))
    p1 = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p1)
    append_dataset(p1, br, EncodeOptions(target_weight=50_000,
                                         fsync=False))
    victims = inc["doc_id"].to_pylist()[:10]
    s = delete_rows(br, "doc_id", values=victims, fsync=False, mode="dv")
    assert s["n_deleted"] == 10
    assert any(r.get("dv_base")
               for r in mf.load_manifest(br).values()), \
        "fixture must exercise a dv addition"
    out = publish_clone(br, fsync=False, link=link)
    assert out["merged"] >= 1
    src_ids = set()
    for b in decode_dataset(src, columns=["doc_id"]).iter_batches(
            batch_format="pyarrow"):
        src_ids.update(b["doc_id"].to_pylist())
    surviving = set(inc["doc_id"].to_pylist()) - set(victims)
    assert surviving <= src_ids
    assert not (set(victims) & src_ids)
    assert verify_manifest(src)["n_bad"] == 0
    if not link:
        # copy mode folded the mask: no source record depends on a
        # clone-side base file
        assert not any(r.get("dv_base")
                       for r in mf.load_manifest(src).values())
        sweep_invisible(src)
        assert verify_manifest(src)["n_bad"] == 0


def test_dv_upsert_matches_rewrite_and_keeps_bases(ray_session, tmp_path):
    """upsert_rows(mode='dv'): the matched rows mask out via sidecars
    staged under the upsert family (one atomic flip with the inserts),
    touched base files stay bit-untouched, and the merged view equals
    rewrite-mode upsert exactly."""
    from parquet2_ray.pipelines.upsert_pipeline import upsert_rows

    t = make_tokens_table(600, seed=11)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    outs = {}
    for m in ("rewrite", "dv"):
        out = str(tmp_path / f"cont_{m}")
        encode_dataset(src, out, EncodeOptions(target_weight=40_000,
                                               fsync=False))
        outs[m] = out
    # increment: rewrite 20 existing docs with new payloads + 10 new
    upd = make_tokens_table(20, seed=12).set_column(
        0, "doc_id", pa.array(t["doc_id"].to_pylist()[:20]))
    fresh = make_tokens_table(10, seed=13).set_column(
        0, "doc_id", pa.array([f"new-{i}" for i in range(10)]))
    inc = pa.concat_tables([upd, fresh])
    p = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p)
    results = {}
    for m, out in outs.items():
        before = {r["path"]: _file_sig(r["path"])
                  for r in mf.load_manifest(out).values()}
        s = upsert_rows(out, p, "doc_id",
                        EncodeOptions(target_weight=40_000, fsync=False),
                        gc=False, mode=m)
        assert s["matched"] == 20 and s["inserted"] == 30
        results[m] = _sorted_pd(_decode_all(out))
        if m == "dv":
            recs = mf.load_manifest(out).values()
            assert any(r.get("dv_base") for r in recs)
            for path, sig in before.items():
                assert _file_sig(path) == sig
        assert verify_manifest(out)["n_bad"] == 0
    assert results["dv"].equals(results["rewrite"])
    # sweep after the fact: referenced bases survive, reads stay green
    sweep_invisible(outs["dv"])
    assert verify_manifest(outs["dv"])["n_bad"] == 0
    assert _sorted_pd(_decode_all(outs["dv"])).equals(results["rewrite"])


def test_dv_upsert_crash_before_marker_is_invisible(ray_session,
                                                    tmp_path):
    from parquet2_ray.pipelines.upsert_pipeline import upsert_rows

    t = make_tokens_table(400, seed=21)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, EncodeOptions(target_weight=40_000,
                                           fsync=False))
    want = _sorted_pd(_decode_all(out))
    upd = make_tokens_table(15, seed=22).set_column(
        0, "doc_id", pa.array(t["doc_id"].to_pylist()[:15]))
    p = str(tmp_path / "inc.parquet")
    pq.write_table(upd, p)
    real = mf.commit_family
    mf.commit_family = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("injected"))
    try:
        with pytest.raises(RuntimeError, match="injected"):
            upsert_rows(out, p, "doc_id",
                        EncodeOptions(target_weight=40_000, fsync=False),
                        gc=False, mode="dv")
    finally:
        mf.commit_family = real
    # staged dv sidecars are invisible: the container reads bit-equal
    assert _sorted_pd(_decode_all(out)).equals(want)
    assert not any(r.get("dv_base")
                   for r in mf.load_manifest(out).values())
    # resume completes the SAME family and the merge lands
    s = upsert_rows(out, p, "doc_id",
                    EncodeOptions(target_weight=40_000, fsync=False),
                    gc=False, mode="dv")
    assert s["matched"] == 15 and not s.get("noop")
    got = _sorted_pd(_decode_all(out))
    assert got.shape[0] == t.num_rows
    assert verify_manifest(out)["n_bad"] == 0


def test_fold_and_maintain(container):
    """fold_deletion_vectors rewrites dv partitions into real files
    (waste threshold honored); maintain_container composes fold +
    compact + checkpoint + sweep and ends with zero dv records, bases
    reclaimed, reads identical, verify green."""
    from parquet2_ray.pipelines.maintain_pipeline import (
        fold_deletion_vectors,
        maintain_container,
    )

    out, t = container
    delete_rows(out, "n_tok", lo=6000, hi=None, fsync=False, mode="dv")
    want = _sorted_pd(_decode_all(out))
    dv_recs = [r for r in mf.load_manifest(out).values()
               if r.get("dv_base")]
    assert dv_recs
    # a threshold above every partition's waste folds nothing
    wastes = [(r["base_rows"] - r["n_rows"]) / r["base_rows"]
              for r in dv_recs]
    s0 = fold_deletion_vectors(out, min_waste=max(wastes) + 0.01,
                               fsync=False)
    assert s0["n_folded"] == 0
    s = maintain_container(out, target_weight=40_000, fsync=False)
    assert s["n_folded"] == len(dv_recs)
    after = mf.load_manifest(out).values()
    assert not any(r.get("dv_base") for r in after)
    raw, _ = mf.load_raw_records(out)
    assert not any(r.get("dv_base") for r in raw.values())
    for r in dv_recs:
        assert not os.path.exists(r["dv_base"])   # bases reclaimed
        assert not os.path.exists(r["path"])      # sidecars reclaimed
    got = _sorted_pd(_decode_all(out))
    assert got.equals(want)
    assert verify_manifest(out)["n_bad"] == 0
    # checkpoint refreshed and serving
    assert os.path.exists(os.path.join(out, "_manifest",
                                       mf.CHECKPOINT_NAME))
    # idempotent second pass
    s2 = maintain_container(out, target_weight=40_000, fsync=False)
    assert s2["n_folded"] == 0
    assert _sorted_pd(_decode_all(out)).equals(want)


def test_maintain_cli(container):
    out, t = container
    delete_rows(out, "n_tok", lo=7000, hi=None, fsync=False, mode="dv")
    want_rows = _decode_all(out).num_rows
    r = subprocess.run(
        [sys.executable, "-m", "parquet2_ray.job", "maintain",
         "--container", out],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.splitlines()[-1])
    assert summary["n_rows"] == want_rows
    assert not any(rr.get("dv_base")
                   for rr in mf.load_manifest(out).values())


def test_dv_sidecar_roundtrip_unit(tmp_path):
    rng = np.random.default_rng(3)
    mask = rng.random(10_001) > 0.13
    base = str(tmp_path / "part-p000000.bin")
    open(base, "wb").close()
    dv = str(tmp_path / "part-p000001.bin")
    mf.write_dv_file(dv, base, mask, fsync=False)
    footer, back = mf.read_dv_mask(dv)
    assert footer["dv_base"] == "part-p000000.bin"   # relative: same dir
    assert footer["base_rows"] == 10_001
    assert footer["num_rows"] == int(mask.sum())
    assert (back == mask).all()
    assert mf.resolve_dv_base(dv, footer) == os.path.join(
        str(tmp_path), "part-p000000.bin")
