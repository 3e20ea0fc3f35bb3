"""Predicate UPDATE over a container (P63, ``update_rows``): scalar and
computed SET, pruning-proven untouched partitions, atomic replaces
flips sharing one txn, schema-evolution interplay, validation, CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.update_pipeline import update_rows
from parquet2_ray.pipelines.verify_pipeline import verify_manifest
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf


def _decode_all(out: str, **kw) -> pa.Table:
    tabs = [pa.Table.from_pandas(b) for b in
            decode_dataset(out, **kw).iter_batches(batch_format="pandas")]
    return pa.concat_tables(tabs, promote_options="permissive")


def _sorted_pd(t: pa.Table):
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    if "tokens" in df.columns:
        df["tokens"] = df["tokens"].map(tuple)
    return df


@pytest.fixture()
def container(ray_session, tmp_path):
    t = make_tokens_table(900, seed=63)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, EncodeOptions(target_weight=40_000,
                                           fsync=False))
    return out, t


def test_scalar_update_matches_brute(container):
    out, t = container
    before = mf.load_manifest(out)
    s = update_rows(out, "n_tok", {"source": "flagged"},
                    lo=6000, hi=None, fsync=False)
    mask = pc.fill_null(pc.greater_equal(t["n_tok"], 6000), False)
    n = int(pc.sum(mask).as_py())
    assert s["n_updated"] == n and n > 0
    want = t.set_column(
        t.column_names.index("source"), "source",
        pc.if_else(mask, pa.scalar("flagged"), t["source"]))
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])
    # untouched partitions kept their exact records
    after = mf.load_manifest(out)
    untouched = [pid for pid in after if pid in before]
    assert untouched
    for pid in untouched:
        assert after[pid]["fingerprint"] == before[pid]["fingerprint"]
    # every update record shares one txn, op stamped
    upd = [r for r in after.values() if pid not in before
           or r.get("op") == "update"]
    txns = {mf.record_txn(r) for r in after.values()
            if r.get("op") == "update"}
    assert len(txns) == 1 and upd
    assert verify_manifest(out)["n_bad"] == 0


def test_computed_update_and_value_predicate(container):
    out, t = container
    victims = t["doc_id"].to_pylist()[:25]
    s = update_rows(out, "doc_id",
                    {"n_tok": lambda tb: pc.multiply(tb["n_tok"], 2)},
                    values=victims, fsync=False)
    assert s["n_updated"] == 25
    got = _decode_all(out)
    vm = pc.is_in(got["doc_id"], value_set=pa.array(victims))
    src = {d.as_py(): n.as_py() for d, n in zip(t["doc_id"], t["n_tok"])}
    for d, n in zip(got.filter(vm)["doc_id"], got.filter(vm)["n_tok"]):
        assert n.as_py() == 2 * src[d.as_py()]
    inv = pc.invert(vm)
    for d, n in zip(got.filter(inv)["doc_id"].to_pylist()[:50],
                    got.filter(inv)["n_tok"].to_pylist()[:50]):
        assert n == src[d]


def test_update_time_travel_and_validation(container):
    out, t = container
    pre = max(mf.record_txn(r) for r in mf.load_manifest(out).values())
    update_rows(out, "n_tok", {"source": "x"}, lo=0, hi=None, fsync=False)
    old = _sorted_pd(_decode_all(out, as_of=pre))
    assert old.equals(_sorted_pd(t)[old.columns])
    with pytest.raises(ValueError, match="SET is empty"):
        update_rows(out, "n_tok", {}, lo=0)
    with pytest.raises(ValueError, match="does not cast"):
        update_rows(out, "n_tok", {"n_tok": "not-an-int"}, lo=0)
    with pytest.raises(ValueError, match="no positional update"):
        update_rows(out, "n_tok", {"tokens": 1}, lo=0)
    with pytest.raises(ValueError, match="lo/hi OR values"):
        update_rows(out, "n_tok", {"source": "x"})
    with pytest.raises(ValueError, match="not in container schema"):
        update_rows(out, "nope", {"source": "x"}, lo=0)


def test_update_materializes_new_column(container):
    """SET of a column the container has never seen: evolution-adds it
    (matched rows get the value, the rest stay null)."""
    out, t = container
    s = update_rows(out, "n_tok", {"tier": "long"},
                    lo=6000, hi=None, fsync=False)
    assert s["n_updated"] > 0
    got = _decode_all(out)
    assert "tier" in got.column_names
    m = pc.fill_null(pc.greater_equal(got["n_tok"], 6000), False)
    assert got.filter(m)["tier"].null_count == 0
    assert set(got.filter(m)["tier"].to_pylist()) == {"long"}
    inv = got.filter(pc.invert(m))["tier"]
    assert inv.null_count == len(inv)


def test_update_zero_match_commits_nothing(container):
    out, t = container
    before = set(mf.load_manifest(out))
    s = update_rows(out, "doc_id", {"source": "x"},
                    values=["no-such-doc"], fsync=False)
    assert s["n_updated"] == 0
    assert set(mf.load_manifest(out)) == before


def test_update_cli(container):
    out, t = container
    r = subprocess.run(
        [sys.executable, "-m", "parquet2_ray.job", "update",
         "--container", out, "--column", "n_tok", "--lo", "6000",
         "--set", json.dumps({"source": "cli-flagged"})],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.splitlines()[-1])
    assert summary["n_updated"] > 0
    got = _decode_all(out)
    m = pc.fill_null(pc.greater_equal(got["n_tok"], 6000), False)
    assert set(got.filter(m)["source"].to_pylist()) == {"cli-flagged"}
