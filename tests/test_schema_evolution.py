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


def test_type_conflict_on_added_column_rejected(ray_session, evolved,
                                                tmp_path):
    """Validation runs against the UNION: a type conflict on a column
    added BY evolution (absent from the oldest footer) must be refused,
    or the committed container becomes unreadable."""
    out, *_ = evolved
    bad = pa.table({
        "doc_id": ["z1"],
        "lang": pa.array([7], type=pa.int64()),  # lang is string
    })
    pq.write_table(bad, tmp_path / "bad2.parquet")
    with pytest.raises(ValueError, match="cannot CHANGE column types"):
        append_dataset(str(tmp_path / "bad2.parquet"), out, _opts(),
                       append_id="bad2", evolve_schema=True)


def test_reordered_columns_harmonize(ray_session, tmp_path):
    """Same columns, different order: the union path engages (name-sets
    key order-sensitively) and every block comes back in union order."""
    v1 = pa.table({"doc_id": ["a1", "a2"], "n_tok": pa.array([1, 2],
                                                             type=pa.int32())})
    v2 = pa.table({"n_tok": pa.array([3], type=pa.int32()),
                   "doc_id": ["b1"]})
    pq.write_table(v1, tmp_path / "v1.parquet")
    pq.write_table(v2, tmp_path / "v2.parquet")
    out = str(tmp_path / "cont")
    encode_dataset(str(tmp_path / "v1.parquet"), out, _opts())
    append_dataset(str(tmp_path / "v2.parquet"), out, _opts(),
                   append_id="v2", evolve_schema=True)
    got = _gather(out, "doc_id")
    assert got.num_rows == 3
    schemas = {tuple(got.column_names)}
    assert len(schemas) == 1
    assert got["n_tok"].to_pylist() == [1, 2, 3]


def test_maintenance_ops_on_evolved_container(evolved, tmp_path):
    """compact / delete / lookup_rows / incremental recluster all work
    on an evolved container (the review found each assumed homogeneous
    schemas)."""
    import ray

    from parquet2_ray.pipelines.compact_pipeline import compact_container
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.encode_pipeline import lookup_rows

    out, v1, v2, v3 = evolved
    # lookup on the evolved column: v1 partitions contribute nothing
    langs = v2["lang"].to_pylist() + v3["lang"].to_pylist()
    hits = pa.concat_tables([t for t in ray.get(
        lookup_rows(out, "lang", ["en"]).to_arrow_refs()) if t.num_rows])
    assert hits.num_rows == sum(1 for x in langs if x == "en")
    # delete on a column OMITTED by v3: its partitions are proven
    # untouched (null predicate rows never match)
    n_tok_vals = v1["n_tok"].to_pylist() + v2["n_tok"].to_pylist()
    want_del = sum(1 for x in n_tok_vals if x >= 90)
    s = delete_rows(out, "n_tok", lo=90, fsync=False)
    assert s["n_deleted"] == want_del
    # delete on the ADDED column works too
    s2 = delete_rows(out, "lang", values=["pt"], fsync=False)
    assert s2["n_deleted"] == sum(1 for x in langs if x == "pt")
    # compaction merges across schema versions (padded union)
    c = compact_container(out, target_weight=10**9, small_frac=1.0,
                          fsync=False)
    assert c["n_rows"] == 1500 - want_del - s2["n_deleted"]
    got = _gather(out, "doc_id")
    assert got.num_rows == c["n_rows"]
    assert set(got.column_names) == {"doc_id", "n_tok", "lang"}


def test_datasource_and_agg_on_evolved(evolved):
    import ray
    import ray.data as rd

    from parquet2_ray.pipelines.container_agg import aggregate_clustered
    from parquet2_ray.sources.datasource import P2RDatasource

    out, v1, v2, v3 = evolved
    ds = rd.read_datasource(P2RDatasource(out, columns=["doc_id", "lang"]))
    t = pa.concat_tables([b for b in ray.get(ds.to_arrow_refs())
                          if b.num_rows])
    assert t.num_rows == 1500
    assert t["lang"].null_count == v1.num_rows
    # aggregate over the evolved column: v1 rows form the null group
    g = aggregate_clustered(out, "lang", {"n_tok": ["count"]})
    langs = v2["lang"].to_pylist() + v3["lang"].to_pylist()
    assert g.num_rows == len(set(langs)) + 1  # + null group


def test_join_and_incremental_recluster_on_evolved(ray_session, tmp_path):
    import ray

    from parquet2_ray.pipelines.container_join import merge_join_containers
    from parquet2_ray.pipelines.recluster_pipeline import incremental_recluster

    rng = np.random.default_rng(71)
    # ids interleave across versions so the appended partitions OVERLAP
    # the base's spans (a real messy tail)
    v1 = pa.table({
        "doc_id": [f"d{i:05d}" for i in rng.choice(40000, 2000,
                                                   replace=False)],
        "n_tok": pa.array(rng.integers(1, 100, 2000), type=pa.int32()),
    })
    v2 = pa.table({
        "doc_id": [f"d{i:05d}" for i in rng.choice(40000, 400,
                                                   replace=False)],
        "n_tok": pa.array(rng.integers(1, 100, 400), type=pa.int32()),
        "lang": pa.array(rng.choice(["en", "de"], 400)),
    })
    pq.write_table(v1, tmp_path / "v1.parquet")
    pq.write_table(v2, tmp_path / "v2.parquet")
    out = str(tmp_path / "cont")
    encode_dataset(str(tmp_path / "v1.parquet"), out,
                   _opts(range_key="doc_id"))
    append_dataset(str(tmp_path / "v2.parquet"), out, _opts(),
                   append_id="v2", evolve_schema=True)
    # join the evolved container against a plain lookup side
    names = pa.table({
        "doc_id": v1["doc_id"][:500].to_pylist(),
        "label": [f"L{i}" for i in range(500)],
    })
    pq.write_table(names, tmp_path / "names.parquet")
    nc = str(tmp_path / "names_c")
    encode_dataset(str(tmp_path / "names.parquet"), nc,
                   _opts(range_key="doc_id"))
    got = pa.concat_tables([t for t in ray.get(
        merge_join_containers(out, nc, "doc_id").to_arrow_refs())
        if t.num_rows])
    # every name key is unique in v1 and may repeat in v2's sample
    v2_ids = set(v2["doc_id"].to_pylist())
    want = 500 + sum(1 for d in names["doc_id"].to_pylist()
                     if d in v2_ids)
    assert got.num_rows == want
    assert "lang" in got.column_names  # evolved column survives, padded
    # incremental recluster across schema versions: the messy set mixes
    # v1 (no lang) and v2 partitions → harmonized before the exchange
    s = incremental_recluster(out, "doc_id", _opts())
    assert s["n_rows"] == 2400
    got2 = _gather(out, "doc_id")
    assert got2.num_rows == 2400
    assert got2["lang"].null_count == v1.num_rows
