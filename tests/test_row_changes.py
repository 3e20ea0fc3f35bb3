"""P56 row-level change-data-feed (``row_changes``): net snapshot diff
with insert / delete / update_pre / update_post tagging.

Oracled against a brute-force multiset diff of the two decoded
snapshots (Counter over canonical row tuples, pairing residuals by
key) — independent code path from the engine's fingerprint-cancel +
key-pair shuffle.  Also pins the scale contract: partitions active in
both snapshots are never decoded, and a rewrite-only window (compact)
emits zero changes.

No reference analog (parquet2 has no dataset state at all); the shape
is Delta Lake's change-data-feed / Iceberg's CDC snapshot-diff,
re-derived from the container's lineage records.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.compact_pipeline import compact_container
from parquet2_ray.pipelines.delete_pipeline import delete_rows
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines import encode_pipeline
from parquet2_ray.pipelines.history_pipeline import row_changes
from parquet2_ray.pipelines.upsert_pipeline import upsert_rows
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf

OPTS = EncodeOptions(target_weight=50_000, fsync=False)


def _prefixed(n: int, seed: int, prefix: str) -> pa.Table:
    t = make_tokens_table(n, seed=seed)
    return t.set_column(
        t.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array([prefix] * t.num_rows), t["doc_id"], ""))


def _canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(c for c in df.columns if c != "_change_type")

    def canon(v):
        if isinstance(v, (list, np.ndarray)):
            return tuple(v)
        return v

    return [tuple(canon(v) for v in row)
            for row in df[cols].itertuples(index=False)]


def _brute_diff(a: pd.DataFrame, b: pd.DataFrame, key: str) -> Counter:
    """Counter of (change_type, row_tuple) the engine must reproduce.

    Assumes at most one residual row per key per side (true for all
    unique-key fixtures here), so update pairing is deterministic."""
    cols = sorted(a.columns)
    ra, rb = Counter(_canon_rows(a)), Counter(_canon_rows(b))
    resid_a, resid_b = ra - rb, rb - ra
    ki = cols.index(key)
    keys_a = {t[ki] for t in resid_a}
    keys_b = {t[ki] for t in resid_b}
    paired = {k for k in keys_a & keys_b if k is not None}
    want: Counter = Counter()
    for t, c in resid_a.items():
        ct = "update_pre" if t[ki] in paired else "delete"
        want[(ct, t)] += c
    for t, c in resid_b.items():
        ct = "update_post" if t[ki] in paired else "insert"
        want[(ct, t)] += c
    return want


def _got(ds) -> Counter:
    df = ds.to_pandas()
    rows = _canon_rows(df)
    return Counter(zip(df["_change_type"].tolist(), rows))


def _snap(out: str, as_of=None, columns=None) -> pd.DataFrame:
    return decode_dataset(out, as_of=as_of, columns=columns).to_pandas()


@pytest.fixture()
def lifecycle(ray_session, tmp_path):
    """encode (txn 0) → append (txn 1) → delete (txn 2) → upsert
    (txn 3: half updates, half inserts) → compact (txn 4, gc off)."""
    out = str(tmp_path / "cont")
    base = _prefixed(120, 1, "base/")
    inc = _prefixed(100, 2, "inc/")
    p0, p1 = str(tmp_path / "b.parquet"), str(tmp_path / "i.parquet")
    pq.write_table(base, p0)
    pq.write_table(inc, p1)
    encode_dataset(p0, out, OPTS)
    append_dataset(p1, out, OPTS)
    assert delete_rows(out, "n_tok", lo=4000, hi=None,
                       fsync=False)["n_deleted"] > 0
    # upsert: rewrite 10 surviving base docs with new token payloads
    # (same doc_id), plus 15 brand-new docs
    survivors = _snap(out)
    upd_ids = survivors[survivors.doc_id.str.startswith("base/")][
        "doc_id"].head(10).tolist()
    assert len(upd_ids) == 10
    fresh = _prefixed(15, 3, "new/")
    updated = make_tokens_table(10, seed=9)
    updated = updated.set_column(
        updated.column_names.index("doc_id"), "doc_id",
        pa.array(upd_ids))
    merged = pa.concat_tables([updated, fresh])
    p2 = str(tmp_path / "u.parquet")
    pq.write_table(merged, p2)
    r = upsert_rows(out, p2, "doc_id", OPTS, gc=False)
    assert r["matched"] == 10 and r["inserted"] == 25
    c = compact_container(out, target_weight=200_000, gc=False)
    assert c["n_groups"] >= 1
    return out


def test_every_window_matches_brute_diff(lifecycle):
    out = lifecycle
    for a, b in [(0, 1), (1, 2), (2, 3), (0, 3), (1, None), (0, None)]:
        got = _got(row_changes(out, a, "doc_id", to_txn=b))
        want = _brute_diff(_snap(out, as_of=a), _snap(out, as_of=b),
                           "doc_id")
        assert got == want, (a, b)


def test_upsert_window_emits_update_pairs(lifecycle):
    out = lifecycle
    df = row_changes(out, 2, "doc_id", to_txn=3).to_pandas()
    counts = df["_change_type"].value_counts().to_dict()
    assert counts == {"update_pre": 10, "update_post": 10, "insert": 15}
    pre = df[df._change_type == "update_pre"]
    post = df[df._change_type == "update_post"]
    assert set(pre.doc_id) == set(post.doc_id)
    # pre rows carry the OLD content, post rows the NEW
    old = _snap(out, as_of=2).set_index("doc_id")
    new = _snap(out, as_of=3).set_index("doc_id")
    for _, r in pre.iterrows():
        assert r["n_tok"] == old.loc[r.doc_id, "n_tok"]
    for _, r in post.iterrows():
        assert r["n_tok"] == new.loc[r.doc_id, "n_tok"]


def test_rewrite_only_window_is_empty_and_skips_shared_partitions(
        lifecycle, monkeypatch):
    out = lifecycle
    recs_pre = set(mf.load_manifest(out, as_of=3))
    recs_post = set(mf.load_manifest(out))
    churned = (recs_pre - recs_post) | (recs_post - recs_pre)
    assert churned  # compact really rewrote something
    seen: list[set] = []
    real = encode_pipeline.decode_dataset

    def spy(out_dir, **kw):
        if kw.get("part_ids") is not None:
            seen.append(set(kw["part_ids"]))
        return real(out_dir, **kw)

    monkeypatch.setattr(encode_pipeline, "decode_dataset", spy)
    ds = row_changes(out, 3, "doc_id")  # txn 3 → current: compact only
    assert ds.count() == 0
    assert seen and set().union(*seen) <= churned


def test_empty_window_schema(lifecycle):
    out = lifecycle
    ds = row_changes(out, 4, "doc_id")  # since == latest
    assert ds.count() == 0
    names = set(ds.schema().names)
    assert "_change_type" in names and "doc_id" in names


def test_projection_limits_comparison(lifecycle):
    out = lifecycle
    got = _got(row_changes(out, 0, "doc_id", to_txn=1,
                           columns=["doc_id", "n_tok"]))
    want = _brute_diff(_snap(out, as_of=0, columns=["doc_id", "n_tok"]),
                       _snap(out, as_of=1, columns=["doc_id", "n_tok"]),
                       "doc_id")
    assert got == want
    with pytest.raises(ValueError):
        row_changes(out, 0, "doc_id", columns=["n_tok"])


def test_validation(lifecycle):
    out = lifecycle
    with pytest.raises(ValueError):
        row_changes(out, 3, "doc_id", to_txn=1)     # reversed
    with pytest.raises(ValueError):
        row_changes(out, 99, "doc_id")              # beyond latest
    with pytest.raises(ValueError):
        row_changes(out, 0, "doc_id", to_txn=99)
    with pytest.raises(KeyError):
        row_changes(out, 0, "nope")


def test_window_end_intactness_after_sweep(ray_session, tmp_path):
    """Both window ends are intact-checked: a swept-out `to` snapshot
    refuses instead of silently diffing against partial data (pre-fix
    only `since` was checked), and intact windows keep answering."""
    from parquet2_ray.pipelines.compact_pipeline import sweep_invisible
    from parquet2_ray.pipelines.history_pipeline import tag_snapshot

    out = str(tmp_path / "cont")
    a = _prefixed(60, 1, "a/")
    b = _prefixed(60, 2, "b/")
    c = _prefixed(30, 3, "c/")
    for name, t in (("a", a), ("b", b), ("c", c)):
        pq.write_table(t, str(tmp_path / f"{name}.parquet"))
    encode_dataset(str(tmp_path / "a.parquet"), out, OPTS)        # txn 0
    append_dataset(str(tmp_path / "b.parquet"), out, OPTS)        # txn 1
    victims = b["doc_id"].to_pylist()[:20]
    delete_rows(out, "doc_id", values=victims, fsync=False)       # txn 2
    append_dataset(str(tmp_path / "c.parquet"), out, OPTS)        # txn 3
    # tag genesis, retain from the delete onward: snapshot 1's
    # pre-delete b-partition record is the ONLY swept state
    tag_snapshot(out, "genesis", 0)
    sweep_invisible(out, retain_from_txn=2)
    # intact windows answer: 0→2 is exactly the delete feed
    got = _got(row_changes(out, 0, "doc_id", to_txn=2))
    want = _brute_diff(_snap(out, as_of=0), _snap(out, as_of=2),
                       "doc_id")
    assert got == want and got
    # hollowed `to` refuses with the to_txn label (since=0 is intact
    # via the tag, so only the new to-side check can catch this)
    with pytest.raises(RuntimeError, match="to_txn"):
        row_changes(out, 0, "doc_id", to_txn=1)
    # hollowed `since` still refuses as before
    with pytest.raises(RuntimeError, match="since"):
        row_changes(out, 1, "doc_id", to_txn=3)


def test_null_keys_never_pair(ray_session, tmp_path):
    out = str(tmp_path / "nk")
    base = pa.table({
        "k": pa.array([1, 2, None], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    })
    p0 = str(tmp_path / "nk.parquet")
    pq.write_table(base, p0)
    encode_dataset(p0, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="v",
        target_rows=10, fsync=False))
    # "modify" the null-key row: delete it, append a replacement
    assert delete_rows(out, "v", values=[30], fsync=False)["n_deleted"] == 1
    p1 = str(tmp_path / "nk2.parquet")
    pq.write_table(pa.table({
        "k": pa.array([None], pa.int64()),
        "v": pa.array([31], pa.int64())}), p1)
    append_dataset(p1, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="v",
        target_rows=10, fsync=False))
    df = row_changes(out, 0, "k").to_pandas()
    counts = df["_change_type"].value_counts().to_dict()
    assert counts == {"delete": 1, "insert": 1}   # NOT an update pair


def test_duplicate_keys_multiset(ray_session, tmp_path):
    out = str(tmp_path / "dk")
    base = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([10, 11, 20], pa.int64()),
    })
    p0 = str(tmp_path / "dk.parquet")
    pq.write_table(base, p0)
    encode_dataset(p0, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="v",
        target_rows=10, fsync=False))
    # drop ONE of the duplicate-key rows and add two more k=1 rows
    assert delete_rows(out, "v", values=[11], fsync=False)["n_deleted"] == 1
    p1 = str(tmp_path / "dk2.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array([12, 13], pa.int64())}), p1)
    append_dataset(p1, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="v",
        target_rows=10, fsync=False))
    df = row_changes(out, 0, "k").to_pandas()
    counts = df["_change_type"].value_counts().to_dict()
    # one removed k=1 row pairs with one added → update; the extra
    # added k=1 row is an insert; untouched rows (v=10, v=20) silent
    assert counts == {"update_pre": 1, "update_post": 1, "insert": 1}
    assert set(df[df._change_type == "update_pre"]["v"]) == {11}
    assert set(df[df._change_type != "update_pre"]["v"]) == {12, 13}


def test_cli_diff_e2e(ray_session, tmp_path, capsys):
    import json

    from parquet2_ray.job import main

    src = tmp_path / "in.parquet"
    pq.write_table(_prefixed(80, 4, "a/"), src)
    cont = str(tmp_path / "cont")
    assert main(["encode", "--input", str(src), "--output", cont,
                 "--target-weight", "50000"]) == 0
    capsys.readouterr()
    assert main(["delete", "--container", cont, "--column", "n_tok",
                 "--lo", "3000"]) == 0
    deleted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert deleted["n_deleted"] > 0
    out_dir = str(tmp_path / "feed")
    assert main(["diff", "--container", cont, "--since", "0",
                 "--key", "doc_id", "--output", out_dir]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["changes"] == {"delete": deleted["n_deleted"]}
    import pyarrow.dataset as pads

    feed = pads.dataset(out_dir).to_table()
    assert feed.num_rows == deleted["n_deleted"]
    assert set(feed["_change_type"].to_pylist()) == {"delete"}
