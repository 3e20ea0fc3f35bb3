"""P43 recluster_container: range re-clustering of a committed
container for pruning locality (SURVEY.md §2.10)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    _fold_plan_range,
    _part_ids,
    _rkey_norm,
    decode_dataset,
    encode_dataset,
    prune_partitions_by_range,
)
from parquet2_ray.pipelines.recluster_pipeline import (
    clustering_quality,
    recluster_container,
)


def _gather(out_dir: str, by: str) -> pa.Table:
    import ray

    refs = decode_dataset(out_dir).to_arrow_refs()
    t = pa.concat_tables([r for r in ray.get(refs) if r.num_rows])
    return t.sort_by(by)


@pytest.fixture(scope="module")
def source_container(ray_session, tokens_table, tmp_path_factory):
    """A deliberately UNclustered-on-doc_id container: n_tok-range
    partitioning (no group column) spreads every doc_id range across
    every partition, since token counts are independent of doc ids."""
    d = tmp_path_factory.mktemp("reclu")
    src_pq = str(d / "src.parquet")
    pq.write_table(tokens_table, src_pq)
    out = str(d / "container_a")
    encode_dataset(src_pq, out,
                   EncodeOptions(group_col=None, target_weight=60_000,
                                 fsync=False))
    return out, tokens_table, str(d)


def test_recluster_row_equality_and_disjoint_ranges(source_container):
    out_a, table, d = source_container
    out_b = f"{d}/container_b"
    summary = recluster_container(
        out_a, out_b, "doc_id",
        EncodeOptions(target_weight=60_000, fsync=False))
    assert summary["n_rows"] == table.num_rows
    assert summary["plan"]["range_key"] == "doc_id"
    assert summary["n_partitions"] > 3, "need a multi-partition container"
    got = _gather(out_b, "doc_id")
    want = table.sort_by("doc_id")
    assert got.select(want.column_names).equals(want)
    # clustering quality: reclustered partitions' doc_id ranges are
    # pairwise disjoint (factor ~1), the source's all overlap
    qa = clustering_quality(out_a, "doc_id")
    qb = clustering_quality(out_b, "doc_id")
    assert qb["overlap_factor"] <= 1.25
    assert qa["overlap_factor"] >= qa["n_partitions"] * 0.6
    assert qa["n_partitions"] > 3


def test_recluster_prunes_range_reads(source_container):
    out_a, table, d = source_container
    out_b = f"{d}/container_b"  # written by the test above (module scope)
    ids = sorted(table["doc_id"].to_pylist())
    lo, hi = ids[len(ids) // 2], ids[len(ids) // 2 + 40]
    kept_b = prune_partitions_by_range(out_b, "doc_id", lo, hi)
    kept_a = prune_partitions_by_range(out_a, "doc_id", lo, hi)
    assert len(kept_b) <= 2, "clustered probe must touch O(1) partitions"
    assert len(kept_a) > len(kept_b), "unclustered container can't prune"
    got = _gather_range(out_b, ("doc_id", lo, hi))
    mask = pc.and_(pc.greater_equal(table["doc_id"], lo),
                   pc.less_equal(table["doc_id"], hi))
    want = table.filter(mask).sort_by("doc_id")
    assert got.select(want.column_names).equals(want)


def _gather_range(out_dir: str, key_range) -> pa.Table:
    import ray

    refs = decode_dataset(out_dir, key_range=key_range).to_arrow_refs()
    ts = [r for r in ray.get(refs) if r.num_rows]
    if not ts:
        return pa.table({})
    return pa.concat_tables(ts).sort_by(key_range[0])


def test_encode_dataset_range_key_from_paths(ray_session, tokens_table,
                                             tmp_path):
    """The fused read+split path plans range edges straight from the
    parquet footers' column reads (no Dataset machinery)."""
    src = str(tmp_path / "src.parquet")
    pq.write_table(tokens_table, src)
    out = str(tmp_path / "ranged")
    summary = encode_dataset(
        src, out,
        EncodeOptions(group_col=None, range_key="n_tok", sort_key="n_tok",
                      target_weight=60_000, fsync=False))
    assert summary["n_rows"] == tokens_table.num_rows
    q = clustering_quality(out, "n_tok")
    # duplicate n_tok values may share an edge → allow minimal overlap
    assert q["overlap_factor"] <= 2.0
    got = _gather(out, "doc_id")
    assert got.select(tokens_table.column_names).equals(
        tokens_table.sort_by("doc_id"))


def test_recluster_numeric_key_with_nulls(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 4000
    ts = rng.integers(0, 10_000_000, n)
    key = ts.astype("datetime64[ms]")
    nulls = rng.random(n) < 0.05
    table = pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "event_ts": pa.array(
            [None if m else v for v, m in zip(key, nulls)],
            type=pa.timestamp("ms")),
        "n_tok": pa.array(rng.integers(1, 50, n), type=pa.int32()),
    })
    src = str(tmp_path / "src.parquet")
    pq.write_table(table, src)
    out_a = str(tmp_path / "a")
    encode_dataset(src, out_a, EncodeOptions(
        group_col=None, weight_col="n_tok", target_weight=20_000,
        fsync=False))
    out_b = str(tmp_path / "b")
    summary = recluster_container(
        out_a, out_b, "event_ts",
        EncodeOptions(weight_col="n_tok", target_weight=20_000,
                      fsync=False))
    assert summary["n_partitions"] > 2
    got = _gather(out_b, "doc_id")
    assert got.select(table.column_names).equals(table.sort_by("doc_id"))
    # null keys survive and the timestamp ranges cluster
    assert got["event_ts"].null_count == int(nulls.sum())
    assert clustering_quality(out_b, "event_ts")["overlap_factor"] <= 1.25
    # native datetime bounds prune against the profiles' isoformat
    # strings (bound_in_profile_domain) and the range read is exact
    import datetime as dt

    lo = dt.datetime(1970, 1, 1, 1, 0)
    hi = dt.datetime(1970, 1, 1, 1, 30)
    kept = prune_partitions_by_range(out_b, "event_ts", lo, hi)
    assert 1 <= len(kept) < summary["n_partitions"]
    rng_got = _gather_range(out_b, ("event_ts", lo, hi))
    tt = table.schema.field("event_ts").type
    mask = pc.and_(pc.greater_equal(table["event_ts"], pa.scalar(lo, type=tt)),
                   pc.less_equal(table["event_ts"], pa.scalar(hi, type=tt)))
    want = table.filter(mask)
    assert rng_got.num_rows == want.num_rows > 0
    assert rng_got.sort_by("doc_id").select(table.column_names).equals(
        want.sort_by("doc_id"))


def test_bound_in_profile_domain():
    import datetime as dt

    from parquet2_ray.functions.stats import bound_in_profile_domain as f

    iso = "2024-01-10T00:09:58.778549"
    assert f(dt.datetime(2024, 1, 10), iso) == "2024-01-10T00:00:00"
    assert f(np.datetime64("2024-01-10T12:00"), iso) == "2024-01-10T12:00:00"
    assert f(dt.date(2024, 1, 10), "2024-01-10") == "2024-01-10"
    # pass-throughs: numeric profiles, string bounds, None
    assert f(5, 3) == 5
    assert f("abc", "zzz") == "abc"
    assert f(None, iso) is None
    # isoformat strings order like their datetimes (prefix form included)
    assert f(dt.datetime(2024, 1, 10), iso) < iso
    assert f(dt.datetime(2024, 1, 10, 0, 9, 59), iso) > iso


def test_range_key_validation(ray_session, tokens_table, tmp_path):
    src = str(tmp_path / "src.parquet")
    pq.write_table(tokens_table, src)
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_dataset(src, str(tmp_path / "x"),
                       EncodeOptions(range_key="n_tok"))
    with pytest.raises(ValueError, match="not in input schema"):
        encode_dataset(src, str(tmp_path / "y"),
                       EncodeOptions(group_col=None, range_key="nope"))


def test_fold_plan_range_deterministic_and_balanced():
    rng = np.random.default_rng(3)
    partials = []
    for _ in range(8):
        ks = rng.integers(0, 1_000_000, 512)
        partials.append({
            "n": 50_000, "wsum": 5_000_000, "kind": "i",
            "keys": ks.tolist(), "kw": [100] * 512,
        })
    opts = EncodeOptions(group_col=None, range_key="k",
                         weight_col="w", target_weight=5_000_000)
    p1 = _fold_plan_range(partials, opts)
    p2 = _fold_plan_range(partials, opts)
    assert p1.rkey_edges == p2.rkey_edges
    assert p1.n_parts == 8
    assert p1.rkey_edges == sorted(p1.rkey_edges)


def test_part_ids_range_assignment_kinds():
    from parquet2_ray.pipelines.encode_pipeline import PartitionPlan

    # integer edges
    plan = PartitionPlan(base={"": 0}, edges={"": []}, n_parts=3,
                         rkey="k", rkey_kind="i", rkey_edges=[10, 20])
    batch = pa.table({"k": pa.array([5, 10, 11, 20, 21, None],
                                    type=pa.int64())})
    ids = _part_ids(batch, plan, None, None)
    # edges are lower-INclusive cut points (searchsorted side="right"):
    # partition i holds keys in [edges[i-1], edges[i])
    assert ids.tolist() == [0, 1, 1, 2, 2, 0]
    # string edges: width of batch values may exceed edge width
    plan_s = PartitionPlan(base={"": 0}, edges={"": []}, n_parts=2,
                           rkey="k", rkey_kind="s", rkey_edges=["mm"])
    batch_s = pa.table({"k": pa.array(["aaaa", "mm", "mmmmzz", "zz"])})
    assert _part_ids(batch_s, plan_s, None, None).tolist() == [0, 1, 1, 1]


def test_rkey_norm_domains():
    vals, kind, nulls = _rkey_norm(pa.array([1.5, None, 2.5]))
    assert kind == "f" and nulls.tolist() == [False, True, False]
    vals, kind, _ = _rkey_norm(pa.array([b"\x00\x01", b"\xff"]))
    assert kind == "s" and vals.tolist() == ["0001", "ff"]
    all_null = pa.array([None, None], type=pa.string())
    vals, kind, nulls = _rkey_norm(all_null)
    assert kind == "s" and all(nulls)


def test_zorder_recluster_prunes_both_dimensions(ray_session, tmp_path):
    """Z-order on (x, y): range probes on EITHER column prune, at a
    modest per-column overlap cost vs single-key clustering."""
    from parquet2_ray.pipelines.encode_pipeline import prune_partitions
    rng = np.random.default_rng(11)
    n = 20_000
    table = pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "x": pa.array(rng.integers(0, 1_000_000, n), type=pa.int64()),
        "y": pa.array(rng.random(n), type=pa.float64()),
        "n_tok": pa.array(rng.integers(1, 50, n), type=pa.int32()),
    })
    src = str(tmp_path / "src.parquet")
    pq.write_table(table, src)
    out_a = str(tmp_path / "a")
    encode_dataset(src, out_a, EncodeOptions(
        group_col=None, weight_col="n_tok", target_weight=16_000,
        fsync=False))
    out_z = str(tmp_path / "z")
    summary = recluster_container(
        out_a, out_z, ["x", "y"],
        EncodeOptions(weight_col="n_tok", target_weight=16_000,
                      fsync=False))
    assert summary["n_rows"] == n
    nparts = summary["n_partitions"]
    assert nparts >= 16
    # row content identical modulo the materialized __zcluster column
    got = _gather(out_z, "doc_id")
    assert got.select(table.column_names).equals(table.sort_by("doc_id"))
    assert "__zcluster" in got.column_names
    # both dimensions prune (unclustered touches ALL partitions); the
    # z-curve re-enters a 1-D slab once per locality block, so a 1/8
    # probe on ONE column touches a fraction, not O(1) — measured 20 (x)
    # and 11 (y) of 32 here; the conjunctive 2-D probe is the z-order
    # win: measured 6 of 32 (1/8 × 1/8 region)
    kept = {}
    for col, lo, hi in (("x", 400_000, 525_000), ("y", 0.4, 0.525)):
        kept[col] = set(prune_partitions_by_range(out_z, col, lo, hi))
        kept_a = prune_partitions_by_range(out_a, col, lo, hi)
        assert len(kept_a) == clustering_quality(out_a, col)["n_partitions"]
        assert len(kept[col]) <= (3 * nparts) // 4, (col, len(kept[col]))
    assert len(kept["x"] & kept["y"]) <= nparts // 4, \
        (len(kept["x"] & kept["y"]), nparts)
    # per-column overlap factors sit far below the partition count
    q = summary["clustering"]
    assert q["x"]["overlap_factor"] < nparts * 0.6
    assert q["y"]["overlap_factor"] < nparts * 0.6


def test_zvalues_interleave_golden():
    from parquet2_ray.pipelines.recluster_pipeline import _zvalues

    batch = pa.table({"a": pa.array([0, 3], type=pa.int64()),
                      "b": pa.array([1, 2], type=pa.int64())})
    # cell(v) = #grid entries <= v (searchsorted side="right")
    grids = {"a": ("f", np.array([0.0, 1.0, 2.0])),
             "b": ("f", np.array([0.0, 1.0, 2.0]))}
    z = _zvalues(batch, ["a", "b"], grids, bits=2)
    # row0: cells (1,2): a bits 01 -> pos0; b bits 10 -> pos3 => 1+8=9
    # row1: cells (3,3): a bits 11 -> pos0,2; b bits 11 -> pos1,3 => 15
    assert z.tolist() == [9, 15]


def test_clustered_decode_streams_globally_sorted(source_container):
    """decode_dataset emits partitions in ascending part-id order and
    Ray preserves block order, so a range-clustered container streams
    back globally sorted on its key without any sort stage."""
    out_a, table, d = source_container
    out_b = f"{d}/container_b"  # doc_id-reclustered by the first test
    import ray

    seen = []
    for ref in decode_dataset(out_b, columns=["doc_id"]).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            seen.extend(t["doc_id"].to_pylist())
    assert seen == sorted(seen)
    assert len(seen) == table.num_rows


# ---- incremental recluster (in-place, family-atomic) ----

def _k_table(n, lo, hi, seed, tag):
    rng = np.random.default_rng(seed)
    return pa.table({
        "rid": pa.array([f"{tag}-{i:06d}" for i in range(n)]),
        "k": pa.array(rng.integers(lo, hi, n), type=pa.int64()),
        "n_tok": pa.array(rng.integers(1, 20, n), type=pa.int32()),
    })


def _incr_setup(tmp_path):
    """Clustered base + two month-wide appends → degraded layout."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset

    base_t = _k_table(10_000, 0, 100_000, 1, "base")
    src = str(tmp_path / "base.parquet")
    pq.write_table(base_t, src)
    out = str(tmp_path / "cont")
    opts = EncodeOptions(group_col=None, weight_col=None, sort_key="k",
                         range_key="k", target_rows=2000, fsync=False)
    encode_dataset(src, out, opts)
    incs = []
    for i in range(2):
        t = _k_table(1000, 0, 100_000, 10 + i, f"inc{i}")
        p = str(tmp_path / f"inc{i}.parquet")
        pq.write_table(t, p)
        aopts = EncodeOptions(group_col=None, weight_col=None, sort_key="k",
                              target_rows=2000, fsync=False)
        append_dataset(p, out, aopts, append_id=f"inc-{i}")
        incs.append(t)
    union = pa.concat_tables([base_t] + incs)
    return out, union


def test_incremental_recluster_rewrites_only_messy(ray_session, tmp_path):
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster
    from parquet2_ray.state import manifest as mf

    out, union = _incr_setup(tmp_path)
    before = mf.load_manifest(out)
    core_fps = {pid: r["fingerprint"] for pid, r in before.items()}
    s = incremental_recluster(
        out, "k", EncodeOptions(weight_col=None, target_rows=2000,
                                fsync=False))
    assert s["n_messy"] == 2, s          # exactly the two appended parts
    assert s["n_rows"] == union.num_rows
    after = mf.load_manifest(out)
    # the disjoint core is untouched: same records, same fingerprints
    for pid, r in after.items():
        if pid in core_fps:
            assert r["fingerprint"] == core_fps[pid]
    # rows exact after the rewrite
    got = _gather(out, "rid")
    assert got.select(union.column_names).equals(union.sort_by("rid"))
    # layout restored: new partitions disjoint among themselves, each
    # overlapping only O(1) core partitions
    assert s["clustering"]["overlap_factor"] <= 3.0
    # the messy ids are gone and GC swept their records/files
    assert not (set(before) - set(core_fps)) & set(after)


def test_incremental_recluster_noop_on_clean_container(ray_session,
                                                       tmp_path):
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster

    t = _k_table(5000, 0, 50_000, 3, "b")
    src = str(tmp_path / "b.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="k", range_key="k",
        target_rows=1000, fsync=False))
    s = incremental_recluster(out, "k", EncodeOptions(
        weight_col=None, target_rows=1000, fsync=False))
    assert s.get("noop") and s["n_new"] == 0


def test_incremental_recluster_crash_before_marker(ray_session, tmp_path,
                                                   monkeypatch):
    """A crash after the staged records but BEFORE the family marker
    leaves the container bit-identical to its pre-recluster state — no
    lost rows, no duplicates — and a re-run completes."""
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster
    from parquet2_ray.state import manifest as mf

    out, union = _incr_setup(tmp_path)
    before = dict(mf.load_manifest(out))

    def boom(*a, **k):
        raise RuntimeError("injected crash before family commit")

    monkeypatch.setattr(mf, "commit_family", boom)
    with pytest.raises(RuntimeError, match="injected"):
        incremental_recluster(out, "k", EncodeOptions(
            weight_col=None, target_rows=2000, fsync=False))
    monkeypatch.undo()
    # staged state is invisible: the manifest and the decoded rows are
    # exactly the pre-recluster container
    mid = mf.load_manifest(out)
    assert set(mid) == set(before)
    got = _gather(out, "rid")
    assert got.select(union.column_names).equals(union.sort_by("rid"))
    # re-run resumes into the same family and completes
    s = incremental_recluster(out, "k", EncodeOptions(
        weight_col=None, target_rows=2000, fsync=False))
    assert s["n_rows"] == union.num_rows
    got2 = _gather(out, "rid")
    assert got2.select(union.column_names).equals(union.sort_by("rid"))


def test_family_visibility_unit(tmp_path):
    """load_manifest: staged family records (and their replaces) are
    invisible until commit_family's single atomic write."""
    from parquet2_ray.state import manifest as mf
    from parquet2_ray.state.fsio import ensure_dir

    out = str(tmp_path / "c")
    ensure_dir(out + "/_manifest")
    mf.commit_manifest_record(out, {"part_id": "p000000", "path": f"{out}/part-p000000.bin"}, fsync=False)
    mf.commit_manifest_record(out, {"part_id": "p000001", "path": f"{out}/part-p000001.bin",
                                    "family": "fam1",
                                    "replaces": ["p000000"]}, fsync=False)
    act = mf.load_manifest(out)
    assert set(act) == {"p000000"}, "staged record must be invisible"
    mf.commit_family(out, "fam1", fsync=False)
    act = mf.load_manifest(out)
    assert set(act) == {"p000001"}, "marker activates member + replaces"
    assert mf.family_committed(out, "fam1")


def test_append_allocates_past_staged_family_ids(ray_session, tmp_path,
                                                 monkeypatch):
    """An abandoned incremental recluster leaves invisible STAGED
    records at high ids; a later append must allocate past them (raw
    ids, not the active set) or it would overwrite staged files and a
    family re-run could then clobber the append's committed data."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.compact_pipeline import _raw_record_ids
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster
    from parquet2_ray.state import manifest as mf

    out, union = _incr_setup(tmp_path)

    def boom(*a, **k):
        raise RuntimeError("abandon")

    monkeypatch.setattr(mf, "commit_family", boom)
    with pytest.raises(RuntimeError, match="abandon"):
        incremental_recluster(out, "k", EncodeOptions(
            weight_col=None, target_rows=2000, fsync=False), gc=False)
    monkeypatch.undo()
    staged_max = max(_raw_record_ids(out))
    late = _k_table(500, 0, 100_000, 99, "late")
    p = str(tmp_path / "late.parquet")
    pq.write_table(late, p)
    append_dataset(p, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="k", target_rows=2000,
        fsync=False), append_id="late")
    # every id the append committed lies past the staged range
    active = mf.load_manifest(out)
    assert max(int(pid[1:]) for pid in active) > staged_max
    # the container stays exact: base + 2 incs + late (staged invisible)
    want = pa.concat_tables([union, late])
    got = _gather(out, "rid")
    assert got.select(want.column_names).equals(want.sort_by("rid"))
    # and a fresh incremental recluster (new messy set → new family)
    # completes with exact rows
    s2 = incremental_recluster(out, "k", EncodeOptions(
        weight_col=None, target_rows=2000, fsync=False))
    assert s2["n_rows"] == want.num_rows
    got2 = _gather(out, "rid")
    assert got2.select(want.column_names).equals(want.sort_by("rid"))


def test_incremental_rerun_with_changed_options_gets_fresh_family(
        ray_session, tmp_path, monkeypatch):
    """Abandon a run, then re-run with DIFFERENT plan options: the fid
    differs, so the old staged generation stays invisible (GC'd), never
    activating alongside the new one."""
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster
    from parquet2_ray.state import manifest as mf

    out, union = _incr_setup(tmp_path)

    def boom(*a, **k):
        raise RuntimeError("abandon")

    monkeypatch.setattr(mf, "commit_family", boom)
    with pytest.raises(RuntimeError, match="abandon"):
        incremental_recluster(out, "k", EncodeOptions(
            weight_col=None, target_rows=500, fsync=False), gc=False)
    monkeypatch.undo()
    s = incremental_recluster(out, "k", EncodeOptions(
        weight_col=None, target_rows=2000, fsync=False))
    assert s["n_rows"] == union.num_rows
    got = _gather(out, "rid")
    assert got.select(union.column_names).equals(union.sort_by("rid"))


def test_randomized_maintenance_lifecycle_with_recluster(ray_session,
                                                         tmp_path):
    """Property-style stress over the FULL maintenance family: a random
    interleaving of appends, incremental reclusters (some crashed
    before the family marker), compactions, and range deletes must keep
    decode == the expected row set at every step — the family-atomic
    staging, raw-id allocation, GC, and replaces machinery all
    interacting on one container."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.compact_pipeline import compact_container
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster
    from parquet2_ray.state import manifest as mf

    rng = np.random.default_rng(4096)
    out = f"{tmp_path}/cont"
    opts = EncodeOptions(group_col=None, weight_col=None, sort_key="k",
                         target_rows=600, fsync=False)

    def mk(i, n):
        return pa.table({
            "rid": pa.array([f"s{i:02d}-{j:05d}" for j in range(n)]),
            "k": pa.array(rng.integers(0, 100_000, n), type=pa.int64()),
            "n_tok": pa.array(rng.integers(1, 30, n), type=pa.int32()),
        })

    t0 = mk(0, 1500)
    pq.write_table(t0, f"{tmp_path}/s00.parquet")
    encode_dataset(f"{tmp_path}/s00.parquet", out,
                   EncodeOptions(group_col=None, weight_col=None,
                                 sort_key="k", range_key="k",
                                 target_rows=600, fsync=False))
    expected = t0
    n_inc = 0
    for step in range(10):
        op = int(rng.integers(0, 4))
        if op == 0:                       # append
            n_inc += 1
            t = mk(n_inc, int(rng.integers(100, 400)))
            pq.write_table(t, f"{tmp_path}/s{n_inc:02d}.parquet")
            append_dataset(f"{tmp_path}/s{n_inc:02d}.parquet", out, opts,
                           append_id=f"s{n_inc:02d}")
            expected = pa.concat_tables([expected, t])
        elif op == 1:                     # incremental recluster
            crash = bool(rng.integers(0, 2))
            if crash:
                real = mf.commit_family
                mf.commit_family = lambda *a, **kw: (_ for _ in ()).throw(
                    RuntimeError("injected"))
                try:
                    # raises only when a rewrite actually staged (a
                    # clean container no-ops before the marker)
                    incremental_recluster(out, "k", opts, gc=False)
                except RuntimeError:
                    pass
                finally:
                    mf.commit_family = real
            else:
                incremental_recluster(out, "k", opts)
        elif op == 2:                     # compact
            compact_container(out, target_weight=25_000,
                              gc=bool(rng.integers(0, 2)), fsync=False)
        else:                             # range delete on k
            lo = int(rng.integers(0, 90_000))
            hi = lo + int(rng.integers(500, 4_000))
            delete_rows(out, "k", lo=lo, hi=hi, fsync=False)
            kv = expected["k"]
            keep = pc.or_kleene(pc.less(kv, lo), pc.greater(kv, hi))
            expected = expected.filter(pc.fill_null(keep, True))
        got = _gather(out, "rid") if expected.num_rows else None
        if expected.num_rows:
            assert got.select(expected.column_names).equals(
                expected.sort_by("rid")), f"divergence at step {step}"


def test_compact_preserves_clustering(ray_session, tokens_table,
                                      tmp_path):
    """Compaction of a key-clustered container must keep the layout
    clustered: merged groups re-sort on the recorded sort key and
    their [min,max] is the union of CONSECUTIVE ranges, so the overlap
    factor cannot degrade and range probes keep pruning."""
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.compact_pipeline import compact_container

    d = str(tmp_path)
    src_pq = f"{d}/src.parquet"
    pq.write_table(tokens_table, src_pq)
    flat = f"{d}/flat"
    clustered = f"{d}/clustered"
    encode_dataset(src_pq, flat,
                   EncodeOptions(group_col=None, target_weight=120_000,
                                 fsync=False))
    # many deliberately-small range partitions so compaction has work
    recluster_container(flat, clustered, "doc_id",
                        EncodeOptions(target_weight=15_000, fsync=False))
    q_before = clustering_quality(clustered, "doc_id")
    assert q_before["n_partitions"] >= 8
    c = compact_container(clustered, target_weight=60_000, fsync=False)
    assert c["n_groups"] >= 1 and c["n_partitions"] < q_before["n_partitions"]
    q_after = clustering_quality(clustered, "doc_id")
    assert q_after["overlap_factor"] <= q_before["overlap_factor"] + 1e-9
    # range probe still prunes to O(selectivity) partitions + rows exact
    lo, hi = "code/", "code/~"
    got = decode_dataset(clustered, key_range=("doc_id", lo, hi)).to_pandas()
    pdf = tokens_table.to_pandas()
    want = pdf[(pdf.doc_id >= lo) & (pdf.doc_id <= hi)]
    assert sorted(got.doc_id) == sorted(want.doc_id)
    from parquet2_ray.pipelines.encode_pipeline import (
        prune_partitions_by_range,
    )

    touched = prune_partitions_by_range(clustered, "doc_id", lo, hi)
    assert len(touched) <= max(2, q_after["n_partitions"] // 2)


def test_conjunctive_key_ranges_multiply_pruning(ray_session, tmp_path):
    """decode_dataset(key_ranges=[...]) — AND of range predicates:
    partition pruning intersects the per-column probes (the Z-order
    layout's query shape), rows equal the brute-force double filter,
    and projection / validation compose."""
    from parquet2_ray.pipelines.encode_pipeline import (
        prune_partitions_by_range,
    )
    from parquet2_ray.state import manifest as mfst

    rng = np.random.default_rng(23)
    n = 20_000
    table = pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "x": pa.array(rng.integers(0, 1_000_000, n), type=pa.int64()),
        "y": pa.array(rng.random(n), type=pa.float64()),
        "n_tok": pa.array(rng.integers(1, 50, n), type=pa.int32()),
    })
    src = str(tmp_path / "src.parquet")
    pq.write_table(table, src)
    out_a = str(tmp_path / "a")
    encode_dataset(src, out_a, EncodeOptions(
        group_col=None, weight_col="n_tok", target_weight=16_000,
        fsync=False))
    out_z = str(tmp_path / "z")
    recluster_container(
        out_a, out_z, ["x", "y"],
        EncodeOptions(weight_col="n_tok", target_weight=16_000,
                      fsync=False))
    preds = [("x", 100_000, 220_000), ("y", 0.35, 0.5)]

    # pruning multiplies: the conjunctive path set is the intersection
    recs = mfst.load_manifest(out_z)
    keep_x = set(prune_partitions_by_range(out_z, *preds[0], records=recs))
    keep_y = set(prune_partitions_by_range(out_z, *preds[1], records=recs))
    both = keep_x & keep_y
    assert 0 < len(both) < len(keep_x) and len(both) < len(keep_y)
    assert len(keep_x) < len(recs) and len(keep_y) < len(recs)
    got = pa.concat_tables(
        list(decode_dataset(out_z, key_ranges=preds)
             .iter_batches(batch_format="pyarrow")),
        promote_options="permissive").sort_by("doc_id")
    import pyarrow.compute as pc
    want = table.filter(
        pc.and_(pc.and_(pc.greater_equal(table["x"], 100_000),
                        pc.less_equal(table["x"], 220_000)),
                pc.and_(pc.greater_equal(table["y"], 0.35),
                        pc.less_equal(table["y"], 0.5)))).sort_by("doc_id")
    assert got.select(table.column_names).equals(want)
    assert got.num_rows > 0

    # projection: predicate columns decode for the filter, then drop
    proj = pa.concat_tables(
        list(decode_dataset(out_z, key_ranges=preds, columns=["doc_id"])
             .iter_batches(batch_format="pyarrow")),
        promote_options="permissive").sort_by("doc_id")
    assert proj.column_names == ["doc_id"]
    assert proj["doc_id"].to_pylist() == want["doc_id"].to_pylist()

    # single key_range unchanged + mutual exclusion validated
    one = pa.concat_tables(
        list(decode_dataset(out_z, key_range=("x", 100_000, 220_000))
             .iter_batches(batch_format="pyarrow")),
        promote_options="permissive")
    assert one.num_rows == table.filter(
        pc.and_(pc.greater_equal(table["x"], 100_000),
                pc.less_equal(table["x"], 220_000))).num_rows
    with pytest.raises(ValueError, match="not both"):
        decode_dataset(out_z, key_range=("x", 0, 1),
                       key_ranges=[("y", 0, 1)])
