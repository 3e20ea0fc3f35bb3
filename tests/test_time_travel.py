"""Snapshot lineage: txn-stamped history, time-travel reads, rollback,
retention-aware GC, and changes-since incremental reads."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
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
from parquet2_ray.pipelines.history_pipeline import (
    changes_since,
    container_history,
    rollback_container,
)
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf

OPTS = EncodeOptions(target_weight=50_000, fsync=False)


def _prefixed(n: int, seed: int, prefix: str) -> pa.Table:
    import pyarrow.compute as pc

    t = make_tokens_table(n, seed=seed)
    return t.set_column(
        t.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array([prefix] * t.num_rows), t["doc_id"], ""))


def _ids(out: str, **kw) -> set:
    ds = decode_dataset(out, columns=["doc_id"], **kw)
    got = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        got.update(b["doc_id"].to_pylist())
    return got


@pytest.fixture()
def storied(ray_session, tmp_path):
    """A container with one commit per op: encode (txn 0), append
    (txn 1), delete (txn 2), compact (txn 3, gc OFF so history
    survives)."""
    out = str(tmp_path / "cont")
    base = _prefixed(150, 1, "base/")
    inc = _prefixed(130, 2, "inc/")
    p0 = str(tmp_path / "base.parquet")
    p1 = str(tmp_path / "inc.parquet")
    pq.write_table(base, p0)
    pq.write_table(inc, p1)
    encode_dataset(p0, out, OPTS)
    append_dataset(p1, out, OPTS)
    d = delete_rows(out, "n_tok", lo=4000, hi=None)
    assert d["n_deleted"] > 0
    c = compact_container(out, target_weight=50_000, gc=False)
    assert c["n_groups"] >= 1
    kept = {i for t, n in
            [(base["doc_id"].to_pylist(), base["n_tok"].to_pylist()),
             (inc["doc_id"].to_pylist(), inc["n_tok"].to_pylist())]
            for i, k in zip(t, n) if k < 4000}
    return out, base, inc, kept


def test_history_one_entry_per_txn(storied):
    out, base, inc, kept = storied
    h = container_history(out)
    assert [(e["txn"], e["op"]) for e in h] == [
        (0, "encode"), (1, "append"), (2, "delete"), (3, "compact")]
    assert h[0]["n_rows"] == base.num_rows
    assert h[1]["n_rows"] == inc.num_rows
    assert h[2]["n_replaced"] >= 1 and h[3]["n_replaced"] >= 2
    assert all(e["part_ids"] for e in h)


def test_as_of_reconstructs_every_snapshot(storied):
    out, base, inc, kept = storied
    assert _ids(out, as_of=0) == set(base["doc_id"].to_pylist())
    assert _ids(out, as_of=1) == set(base["doc_id"].to_pylist()) | set(
        inc["doc_id"].to_pylist())
    assert _ids(out, as_of=2) == kept
    assert _ids(out, as_of=3) == kept == _ids(out)


def test_as_of_composes_with_projection_and_range(storied):
    out, base, inc, kept = storied
    ds = decode_dataset(out, as_of=1, columns=["doc_id", "n_tok"],
                        key_range=("n_tok", 4000, None))
    rows = [r for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    want = {i for t in (base, inc)
            for i, n in zip(t["doc_id"].to_pylist(),
                            t["n_tok"].to_pylist()) if n >= 4000}
    assert {r["doc_id"] for r in rows} == want
    assert all(set(r) == {"doc_id", "n_tok"} for r in rows)


def test_rollback_restores_and_container_stays_maintainable(
        storied, tmp_path):
    out, base, inc, kept = storied
    r = rollback_container(out, 1)
    assert r["rolled_back"] >= 2
    assert _ids(out) == set(base["doc_id"].to_pylist()) | set(
        inc["doc_id"].to_pylist())
    h = container_history(out)
    assert h[-1]["txn"] == 1
    # idempotent: nothing left beyond txn 1
    assert rollback_container(out, 1)["noop"]
    # the container keeps working: a fresh append lands at txn 2 and
    # its ids don't collide with the rolled-back ones
    inc2 = _prefixed(40, 3, "inc2/")
    p = str(tmp_path / "inc2.parquet")
    pq.write_table(inc2, p)
    append_dataset(p, out, OPTS)
    h = container_history(out)
    assert (h[-1]["txn"], h[-1]["op"]) == (2, "append")
    assert _ids(out) >= set(inc2["doc_id"].to_pylist())
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0


def test_rollback_refuses_after_plain_sweep(storied):
    out, *_ = storied
    assert sweep_invisible(out) > 0   # collapse history to current
    with pytest.raises(RuntimeError, match="GC"):
        rollback_container(out, 1)


def test_retention_sweep_keeps_horizon_restorable(storied):
    out, base, inc, kept = storied
    swept = sweep_invisible(out, retain_from_txn=2)
    assert swept > 0   # the pre-delete originals of txn<=1 are gone
    # at and past the horizon: still answerable
    assert _ids(out, as_of=2) == kept
    r = rollback_container(out, 2)
    assert not r.get("noop")
    assert _ids(out) == kept
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0


def test_rollback_past_retention_horizon_refuses(storied):
    out, *_ = storied
    sweep_invisible(out, retain_from_txn=2)
    with pytest.raises(RuntimeError, match="impossible"):
        rollback_container(out, 1)


def test_changes_since_append_only_window(ray_session, tmp_path):
    out = str(tmp_path / "cont")
    base = _prefixed(100, 1, "base/")
    a = _prefixed(60, 2, "a/")
    b = _prefixed(50, 3, "b/")
    for name, t in [("base", base), ("a", a), ("b", b)]:
        pq.write_table(t, str(tmp_path / f"{name}.parquet"))
    encode_dataset(str(tmp_path / "base.parquet"), out, OPTS)
    ds = changes_since(out, 0)
    assert ds.count() == 0   # nothing after the base encode yet
    append_dataset(str(tmp_path / "a.parquet"), out, OPTS)
    append_dataset(str(tmp_path / "b.parquet"), out, OPTS)
    got = {r["doc_id"] for bt in changes_since(out, 0).iter_batches(
        batch_format="pyarrow") for r in bt.to_pylist()}
    assert got == set(a["doc_id"].to_pylist()) | set(b["doc_id"].to_pylist())
    got1 = {r["doc_id"] for bt in changes_since(
        out, 1, columns=["doc_id"]).iter_batches(batch_format="pyarrow")
        for r in bt.to_pylist()}
    assert got1 == set(b["doc_id"].to_pylist())
    with pytest.raises(ValueError, match="beyond"):
        changes_since(out, 99)


def test_changes_since_tolerates_post_cursor_compaction(
        ray_session, tmp_path):
    out = str(tmp_path / "cont")
    # big base partition (not compactable), two small post-cursor appends
    base = _prefixed(100, 1, "base/")
    a = _prefixed(60, 2, "a/")
    b = _prefixed(50, 3, "b/")
    for name, t in [("base", base), ("a", a), ("b", b)]:
        pq.write_table(t, str(tmp_path / f"{name}.parquet"))
    encode_dataset(str(tmp_path / "base.parquet"),
                   out, EncodeOptions(group_col=None,
                                      target_weight=50_000_000,
                                      fsync=False))
    append_dataset(str(tmp_path / "a.parquet"), out, OPTS)
    append_dataset(str(tmp_path / "b.parquet"), out, OPTS)
    # threshold low enough that the single heavy base partition stays
    # out of the merge: only post-cursor partitions compact
    c = compact_container(out, target_weight=20_000, gc=False)
    assert c["n_compacted"] >= 2   # merged the two appends, not the base
    base_pid = container_history(out)[0]["part_ids"][0]
    assert base_pid in mf.load_manifest(out)   # base partition untouched
    got = {r["doc_id"] for bt in changes_since(out, 0).iter_batches(
        batch_format="pyarrow") for r in bt.to_pylist()}
    assert got == set(a["doc_id"].to_pylist()) | set(b["doc_id"].to_pylist())


def test_changes_since_raises_on_pre_cursor_rewrite(storied):
    out, *_ = storied
    # txns 2 (delete) and 3 (compact) both rewrote txn<=1 partitions
    with pytest.raises(RuntimeError, match="not append-only"):
        changes_since(out, 1)


def test_family_snapshot_is_all_or_none(ray_session, tmp_path):
    from parquet2_ray.pipelines.recluster_pipeline import (
        incremental_recluster,
        recluster_container,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "clustered")
    base = _prefixed(200, 1, "base/")
    pq.write_table(base, str(tmp_path / "base.parquet"))
    encode_dataset(str(tmp_path / "base.parquet"), src, OPTS)
    recluster_container(src, out, "n_tok",
                        EncodeOptions(target_weight=40_000, fsync=False))
    inc = _prefixed(80, 2, "inc/")
    pq.write_table(inc, str(tmp_path / "inc.parquet"))
    append_dataset(str(tmp_path / "inc.parquet"), out, OPTS)
    pre = _ids(out)
    r = incremental_recluster(out, "n_tok", OPTS, gc=False)
    assert r["n_new"] >= 1
    h = container_history(out)
    fam = [e for e in h if e.get("family")]
    assert len(fam) == 1 and fam[0]["committed"] and fam[0]["op"] == "recluster"
    fam_txn = fam[0]["txn"]
    # snapshot BEFORE the family: pre-recluster layout, same rows
    assert _ids(out, as_of=fam_txn - 1) == pre
    assert _ids(out, as_of=fam_txn) == pre == _ids(out)
    # rollback across the family: marker gone, members gone, rows intact
    rollback_container(out, fam_txn - 1)
    assert _ids(out) == pre
    assert not any(n.startswith("family-")
                   for n in os.listdir(os.path.join(out, "_manifest")))
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0


def test_rollback_crash_midway_is_resumable(storied, monkeypatch):
    out, base, inc, kept = storied
    from parquet2_ray.state import fsio

    real = fsio.delete
    calls = {"n": 0}

    def flaky(path):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected crash mid-rollback")
        real(path)

    monkeypatch.setattr(
        "parquet2_ray.pipelines.history_pipeline.fsio.delete", flaky)
    with pytest.raises(OSError, match="injected"):
        rollback_container(out, 1)
    monkeypatch.setattr(
        "parquet2_ray.pipelines.history_pipeline.fsio.delete", real)
    # the interrupted state is a consistent snapshot; re-run completes
    rollback_container(out, 1)
    assert _ids(out) == set(base["doc_id"].to_pylist()) | set(
        inc["doc_id"].to_pylist())
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0


def test_resumed_append_reuses_txn_stamp(ray_session, tmp_path):
    """A crash mid-append must not split one increment across two
    snapshots: the re-run reuses the ledger-reserved txn."""
    out = str(tmp_path / "cont")
    base = _prefixed(100, 1, "base/")
    inc = _prefixed(80, 2, "inc/")
    pq.write_table(base, str(tmp_path / "base.parquet"))
    pq.write_table(inc, str(tmp_path / "inc.parquet"))
    encode_dataset(str(tmp_path / "base.parquet"), out, OPTS)
    append_dataset(str(tmp_path / "inc.parquet"), out, OPTS)
    from parquet2_ray.pipelines.append_pipeline import _load_sessions

    sessions = {s["append_id"]: s for s in _load_sessions(out)}
    assert all(s.get("txn") == 1 for s in sessions.values())
    # resume the same increment: fingerprint-skip, same txn, no new txn
    append_dataset(str(tmp_path / "inc.parquet"), out, OPTS)
    h = container_history(out)
    assert [(e["txn"], e["op"]) for e in h] == [(0, "encode"),
                                                (1, "append")]


def test_randomized_lifecycle_with_snapshots(ray_session, tmp_path):
    """Property-style stress: a random interleaving of appends, deletes,
    compactions, incremental reclusters (some crashed pre-marker),
    retention sweeps, and rollbacks — with the FULL per-txn snapshot
    ledger tracked driver-side and a random retained snapshot
    re-checked via ``as_of`` after every step."""
    import numpy as np
    import pyarrow.compute as pc

    from parquet2_ray.pipelines.recluster_pipeline import (
        incremental_recluster,
    )
    from parquet2_ray.pipelines.history_pipeline import container_history

    rng = np.random.default_rng(20260819)
    out = str(tmp_path / "cont")
    opts = EncodeOptions(group_col=None, weight_col=None, sort_key="k",
                         target_rows=500, fsync=False)

    def mk(i, n):
        return pa.table({
            "rid": pa.array([f"s{i:02d}-{j:05d}" for j in range(n)]),
            "k": pa.array(rng.integers(0, 100_000, n), type=pa.int64()),
            "n_tok": pa.array(rng.integers(1, 30, n), type=pa.int32()),
        })

    def rows(**kw):
        ds = decode_dataset(out, columns=["rid"], **kw)
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(b["rid"].to_pylist())
        return got

    t0 = mk(0, 1200)
    pq.write_table(t0, str(tmp_path / "s00.parquet"))
    encode_dataset(str(tmp_path / "s00.parquet"), out,
                   EncodeOptions(group_col=None, weight_col=None,
                                 sort_key="k", range_key="k",
                                 target_rows=500, fsync=False))
    expected = t0
    snapshots = {0: t0}   # txn -> expected table (the driver ledger)
    n_inc = 0

    def _max_txn():
        return max(e["txn"] for e in container_history(out))

    for step in range(14):
        op = int(rng.integers(0, 7))
        if op == 0:                           # append
            n_inc += 1
            t = mk(n_inc, int(rng.integers(80, 300)))
            p = str(tmp_path / f"s{n_inc:02d}.parquet")
            pq.write_table(t, p)
            append_dataset(p, out, opts, append_id=f"s{n_inc:02d}")
            expected = pa.concat_tables([expected, t])
        elif op == 1:                         # range delete on k —
            # randomly copy-on-write or merge-on-read (P62): the dv
            # path must survive every later sweep/rollback/compact/
            # recluster/upsert interleaving identically
            mode = "dv" if rng.integers(0, 2) else "rewrite"
            lo = int(rng.integers(0, 90_000))
            hi = lo + int(rng.integers(500, 4_000))
            delete_rows(out, "k", lo=lo, hi=hi, fsync=False, mode=mode)
            kv = expected["k"]
            keep = pc.or_kleene(pc.less(kv, lo), pc.greater(kv, hi))
            expected = expected.filter(pc.fill_null(keep, True))
        elif op == 2:                         # compact, history kept
            compact_container(out, target_weight=20_000, gc=False,
                              fsync=False)
        elif op == 3:                         # incremental recluster
            crash = bool(rng.integers(0, 2))
            if crash:
                real = mf.commit_family
                mf.commit_family = lambda *a, **kw: (_ for _ in ()).throw(
                    RuntimeError("injected"))
                try:
                    incremental_recluster(out, "k", opts, gc=False)
                except RuntimeError:
                    pass
                finally:
                    mf.commit_family = real
            else:
                incremental_recluster(out, "k", opts, gc=False)
        elif op == 4 and len(snapshots) > 1:  # retention sweep
            horizon = int(rng.choice(sorted(snapshots)))
            sweep_invisible(out, retain_from_txn=horizon)
            cur = max(snapshots)
            snapshots = {t: v for t, v in snapshots.items()
                         if t >= horizon or t == cur}
        elif op == 5 and len(snapshots) > 1:  # rollback
            to = int(rng.choice(sorted(snapshots)[:-1]))
            rollback_container(out, to, sweep=True)
            snapshots = {t: v for t, v in snapshots.items() if t <= to}
            expected = snapshots[to]   # rollback may resurrect rows a
            #                            later delete removed
        elif op == 6 and expected.num_rows:   # upsert (update + insert)
            import ray.data as rd

            from parquet2_ray.pipelines.upsert_pipeline import upsert_rows

            n_up = min(int(rng.integers(1, 40)), expected.num_rows)
            pick = rng.choice(expected.num_rows, n_up, replace=False)
            upd = expected.take(pa.array(sorted(pick)))
            upd = upd.set_column(
                upd.column_names.index("n_tok"), "n_tok",
                pa.array(rng.integers(100, 200, n_up), type=pa.int32()))
            fresh = mk(90 + step, int(rng.integers(5, 30)))
            inc = pa.concat_tables([upd, fresh])
            upsert_rows(out, rd.from_arrow(inc), "rid", opts,
                        upsert_id=f"u{step}", gc=False,
                        mode="dv" if rng.integers(0, 2) else "rewrite")
            keep = pc.invert(pc.is_in(
                expected["rid"], value_set=inc["rid"].combine_chunks()))
            expected = pa.concat_tables(
                [expected.filter(keep), inc])
        # ledger update + invariants
        cur = _max_txn()
        snapshots[cur] = expected
        assert rows() == set(expected["rid"].to_pylist()), \
            f"divergence at step {step}"
        probe = int(rng.choice(sorted(snapshots)))
        assert rows(as_of=probe) == set(
            snapshots[probe]["rid"].to_pylist()), \
            f"snapshot {probe} divergence at step {step}"
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0


def test_tags_are_retention_roots(storied):
    from parquet2_ray.pipelines.history_pipeline import (
        delete_tag,
        list_tags,
        tag_snapshot,
    )

    out, base, inc, kept = storied
    tag_snapshot(out, "pre-delete", txn=1)
    tag_snapshot(out, "release")          # defaults to latest (3)
    assert list_tags(out) == {"pre-delete": 1, "release": 3}
    with pytest.raises(ValueError, match="shadow"):
        tag_snapshot(out, "7")
    with pytest.raises(ValueError, match="beyond"):
        tag_snapshot(out, "future", txn=9)
    # a plain sweep keeps every TAGGED snapshot restorable
    sweep_invisible(out)
    assert _ids(out, as_of="pre-delete") == set(
        base["doc_id"].to_pylist()) | set(inc["doc_id"].to_pylist())
    assert _ids(out, as_of="release") == kept
    # tag-addressed rollback; tags past the restore point are dropped
    rollback_container(out, "pre-delete")
    assert _ids(out) == set(base["doc_id"].to_pylist()) | set(
        inc["doc_id"].to_pylist())
    assert list_tags(out) == {"pre-delete": 1}
    delete_tag(out, "pre-delete")
    assert list_tags(out) == {}
    with pytest.raises(KeyError):
        delete_tag(out, "pre-delete")


def test_untagged_history_still_collapses(storied):
    from parquet2_ray.pipelines.history_pipeline import tag_snapshot

    out, base, inc, kept = storied
    tag_snapshot(out, "keep2", txn=2)
    swept = sweep_invisible(out)
    assert swept > 0          # txn<=1 originals NOT covered by the tag
    assert _ids(out, as_of=2) == kept          # the tag's snapshot holds
    with pytest.raises(RuntimeError):
        rollback_container(out, 1)             # untagged history is gone


def test_changes_since_accepts_tag_cursor(ray_session, tmp_path):
    from parquet2_ray.pipelines.history_pipeline import tag_snapshot

    out = str(tmp_path / "cont")
    base = _prefixed(80, 1, "base/")
    a = _prefixed(40, 2, "a/")
    pq.write_table(base, tmp_path / "b.parquet")
    pq.write_table(a, tmp_path / "a.parquet")
    encode_dataset(str(tmp_path / "b.parquet"), out, OPTS)
    tag_snapshot(out, "cursor")
    append_dataset(str(tmp_path / "a.parquet"), out, OPTS)
    got = {r["doc_id"] for bt in changes_since(
        out, "cursor", columns=["doc_id"]).iter_batches(
        batch_format="pyarrow") for r in bt.to_pylist()}
    assert got == set(a["doc_id"].to_pylist())
