"""P48 schema evolution: appends may add/omit columns; readers
harmonize to the union schema (SURVEY.md §2.10)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)


def _gather(out_dir, by, **kw) -> pa.Table:
    import ray

    refs = decode_dataset(out_dir, **kw).to_arrow_refs()
    ts = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(ts).sort_by(by) if ts else pa.table({})


def _opts(**kw):
    base = dict(group_col=None, weight_col=None, sort_key="doc_id",
                target_rows=400, fsync=False)
    base.update(kw)
    return EncodeOptions(**base)


@pytest.fixture()
def evolved(ray_session, tmp_path):
    """v1 container (doc_id, n_tok) + v2 increment adding ``lang`` +
    v3 increment omitting ``n_tok``."""
    rng = np.random.default_rng(61)
    v1 = pa.table({
        "doc_id": [f"a{i:05d}" for i in range(1000)],
        "n_tok": pa.array(rng.integers(1, 100, 1000), type=pa.int32()),
    })
    v2 = pa.table({
        "doc_id": [f"b{i:05d}" for i in range(300)],
        "n_tok": pa.array(rng.integers(1, 100, 300), type=pa.int32()),
        "lang": pa.array(rng.choice(["en", "de", "fr"], 300)),
    })
    v3 = pa.table({
        "doc_id": [f"c{i:05d}" for i in range(200)],
        "lang": pa.array(rng.choice(["en", "pt"], 200)),
    })
    for name, t in (("v1", v1), ("v2", v2), ("v3", v3)):
        pq.write_table(t, tmp_path / f"{name}.parquet")
    out = str(tmp_path / "cont")
    encode_dataset(str(tmp_path / "v1.parquet"), out, _opts())
    append_dataset(str(tmp_path / "v2.parquet"), out, _opts(),
                   append_id="v2", evolve_schema=True)
    append_dataset(str(tmp_path / "v3.parquet"), out, _opts(),
                   append_id="v3", evolve_schema=True)
    return out, v1, v2, v3


def test_union_decode_pads_missing_columns(evolved):
    out, v1, v2, v3 = evolved
    got = _gather(out, "doc_id")
    assert set(got.column_names) == {"doc_id", "n_tok", "lang"}
    assert got.num_rows == 1500
    # v1 rows: lang null; v3 rows: n_tok null; v2 rows: fully populated
    assert got["lang"].null_count == v1.num_rows
    assert got["n_tok"].null_count == v3.num_rows
    # values survive exactly where present
    want = {r["doc_id"]: r for r in
            v2.to_pylist() + v3.to_pylist() + v1.to_pylist()}
    for r in got.slice(0, 50).to_pylist() + got.slice(1400, 50).to_pylist():
        w = want[r["doc_id"]]
        assert r.get("n_tok") == w.get("n_tok")
        assert r.get("lang") == w.get("lang")


def test_projection_onto_new_column(evolved):
    out, v1, v2, v3 = evolved
    got = _gather(out, "doc_id", columns=["doc_id", "lang"])
    assert got.column_names == ["doc_id", "lang"]
    assert got.num_rows == 1500
    assert got["lang"].null_count == v1.num_rows


def test_range_read_on_column_missing_from_history(evolved):
    out, v1, v2, v3 = evolved
    # range on lang: v1 partitions predate the column → zero matches
    # from them; v2/v3 rows filter exactly
    got = _gather(out, "doc_id", key_range=("lang", "en", "en"))
    want = sum(1 for x in v2["lang"].to_pylist() + v3["lang"].to_pylist()
               if x == "en")
    assert got.num_rows == want
    assert set(got["lang"].to_pylist()) == {"en"}


def test_evolution_validation(ray_session, evolved, tmp_path):
    out, *_ = evolved
    # changing a shared column's type is refused even with evolve
    bad = pa.table({
        "doc_id": ["x1"],
        "n_tok": pa.array([1.5], type=pa.float64()),
    })
    pq.write_table(bad, tmp_path / "bad.parquet")
    with pytest.raises(ValueError, match="cannot CHANGE column types"):
        append_dataset(str(tmp_path / "bad.parquet"), out, _opts(),
                       append_id="bad", evolve_schema=True)
    # without the flag, add/omit is still an exact-match error
    ok_new = pa.table({"doc_id": ["y1"], "extra": [1]})
    pq.write_table(ok_new, tmp_path / "new.parquet")
    with pytest.raises(ValueError, match="schema mismatch"):
        append_dataset(str(tmp_path / "new.parquet"), out, _opts(),
                       append_id="noflag")


def test_recluster_unifies_evolved_schema(evolved, tmp_path):
    """A full recluster decodes the harmonized union and re-encodes —
    the schema-compaction path for an evolved container."""
    from parquet2_ray.pipelines.recluster_pipeline import recluster_container
    from parquet2_ray.state import manifest as mf

    out, v1, v2, v3 = evolved
    uni = str(tmp_path / "unified")
    recluster_container(out, uni, "doc_id", _opts())
    recs = mf.load_manifest(uni)
    name_sets = {tuple(sorted(r["codecs"])) for r in recs.values()}
    assert len(name_sets) == 1, "recluster must unify the schema"
    got = _gather(uni, "doc_id")
    assert got.num_rows == 1500
    assert got["lang"].null_count == v1.num_rows
    assert got["n_tok"].null_count == v3.num_rows
