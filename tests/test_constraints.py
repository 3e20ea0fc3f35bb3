"""CHECK constraints / expectations (P65): declaration (with
retroactive validation), enforcement on append / upsert / update,
unique via pruned container probe, null semantics, CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.constraints_pipeline import (
    ConstraintViolation,
    check_table,
    drop_constraints,
    get_constraints,
    set_constraints,
)
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.update_pipeline import update_rows
from parquet2_ray.pipelines.upsert_pipeline import upsert_rows
from parquet2_ray.sources.tokens import make_tokens_table

OPTS = EncodeOptions(target_weight=40_000, fsync=False)


@pytest.fixture()
def container(ray_session, tmp_path):
    t = make_tokens_table(400, seed=65)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, OPTS)
    return out, t, tmp_path


def test_declare_show_drop_and_retroactive_validation(container):
    out, t, _ = container
    lo = int(pc.min(t["n_tok"]).as_py())
    set_constraints(out, [
        {"column": "n_tok", "op": ">=", "value": lo},
        {"column": "doc_id", "op": "not_null"},
        {"column": "doc_id", "op": "unique"},
    ], fsync=False)
    assert len(get_constraints(out)) == 3
    # a constraint history already violates refuses at declaration
    with pytest.raises(ConstraintViolation) as ei:
        set_constraints(out, [{"column": "n_tok", "op": ">",
                               "value": lo}], fsync=False)
    assert any(v > 0 for v in ei.value.counts.values())
    # ... unless validation is explicitly skipped
    set_constraints(out, [{"column": "n_tok", "op": ">", "value": lo}],
                    validate=False, fsync=False)
    assert drop_constraints(out)["dropped"]
    assert get_constraints(out) == []
    with pytest.raises(ValueError, match="unknown constraint op"):
        set_constraints(out, [{"column": "x", "op": "between"}])


def test_append_enforcement(container):
    out, t, tmp_path = container
    set_constraints(out, [
        {"column": "n_tok", "op": ">=", "value": 0},
        {"column": "doc_id", "op": "unique"},
    ], fsync=False)
    # a clean increment appends fine
    good = make_tokens_table(50, seed=66).set_column(
        0, "doc_id", pa.array([f"inc-{i}" for i in range(50)]))
    p = str(tmp_path / "good.parquet")
    pq.write_table(good, p)
    append_dataset(p, out, OPTS)
    n_after = decode_dataset(out).count()
    assert n_after == t.num_rows + 50
    # a static violation reserves and stages NOTHING
    bad = good.set_column(
        good.column_names.index("n_tok"), "n_tok",
        pa.array([-1] * 50, type=pa.int32()))
    bad = bad.set_column(0, "doc_id",
                         pa.array([f"bad-{i}" for i in range(50)]))
    pb = str(tmp_path / "bad.parquet")
    pq.write_table(bad, pb)
    with pytest.raises(ConstraintViolation, match="n_tok >= 0"):
        append_dataset(pb, out, OPTS)
    assert decode_dataset(out).count() == n_after
    # a duplicate key against the CONTAINER is caught by the pruned
    # probe; increment-internal duplicates are counted too
    dup = good.slice(0, 5)
    pd_ = str(tmp_path / "dup.parquet")
    pq.write_table(dup, pd_)
    with pytest.raises(ConstraintViolation, match="doc_id unique"):
        append_dataset(pd_, out, OPTS)
    internal = pa.concat_tables([
        good.slice(5, 2).set_column(0, "doc_id",
                                    pa.array(["x-1", "x-1"]))])
    pi = str(tmp_path / "intdup.parquet")
    pq.write_table(internal, pi)
    with pytest.raises(ConstraintViolation, match="doc_id unique"):
        append_dataset(pi, out, OPTS)


def test_upsert_enforcement_skips_unique(container):
    out, t, tmp_path = container
    set_constraints(out, [
        {"column": "n_tok", "op": ">=", "value": 0},
        {"column": "doc_id", "op": "unique"},
    ], fsync=False)
    # an upsert whose keys exist must NOT trip the unique probe
    upd = make_tokens_table(5, seed=67).set_column(
        0, "doc_id", pa.array(t["doc_id"].to_pylist()[:5]))
    p = str(tmp_path / "u.parquet")
    pq.write_table(upd, p)
    s = upsert_rows(out, p, "doc_id", OPTS, gc=False)
    assert s["matched"] == 5
    # but a static violation still refuses before staging
    bad = upd.set_column(upd.column_names.index("n_tok"), "n_tok",
                         pa.array([-1] * 5, type=pa.int32()))
    pb = str(tmp_path / "ub.parquet")
    pq.write_table(bad, pb)
    with pytest.raises(ConstraintViolation, match="n_tok >= 0"):
        upsert_rows(out, pb, "doc_id", OPTS, gc=False)


def test_update_enforcement_scalar_sets(container):
    out, t, _ = container
    set_constraints(out, [{"column": "n_tok", "op": ">=", "value": 0}],
                    fsync=False)
    with pytest.raises(ConstraintViolation, match="n_tok >= 0"):
        update_rows(out, "doc_id", {"n_tok": -1},
                    values=[t["doc_id"][0].as_py()], fsync=False)
    s = update_rows(out, "doc_id", {"n_tok": 7},
                    values=[t["doc_id"][0].as_py()], fsync=False)
    assert s["n_updated"] == 1


def test_null_semantics_and_in(ray_session):
    tbl = pa.table({"a": pa.array([1, None, 3]),
                    "b": pa.array(["x", "y", None])})
    # SQL CHECK: nulls pass comparisons unless null_ok false
    assert check_table(tbl, [{"column": "a", "op": ">", "value": 0}]) \
        == {"a > 0": 0}
    assert check_table(tbl, [{"column": "a", "op": ">", "value": 0,
                              "null_ok": False}])["a > 0"] == 1
    assert check_table(tbl, [{"column": "a", "op": "not_null"}]) \
        == {"a not_null": 1}
    assert check_table(tbl, [{"column": "b", "op": "in",
                              "values": ["x", "y"]}])["b in ['x', 'y']"] == 0
    assert check_table(tbl, [{"column": "b", "op": "in",
                              "values": ["x"], "null_ok": False}])[
        "b in ['x']"] == 2
    # constraint on a column the batch lacks: every row counts null
    assert check_table(tbl, [{"column": "c", "op": "not_null"}]) \
        == {"c not_null": 3}


def test_constraints_cli(container):
    out, t, _ = container
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "parquet2_ray.job", "constraints",
         "--container", out, "--set",
         json.dumps([{"column": "n_tok", "op": ">=", "value": 0}])],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "parquet2_ray.job", "constraints",
         "--container", out],
        capture_output=True, text=True, cwd=repo)
    assert json.loads(r2.stdout.splitlines()[-1])["constraints"] == [
        {"column": "n_tok", "op": ">=", "value": 0}]
