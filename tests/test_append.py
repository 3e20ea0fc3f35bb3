"""Incremental container ingest (append_dataset): id allocation, crash
resume into a reserved range, reader transparency, pruning."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
)
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf


def _sorted_pd(t: pa.Table):
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["tokens"] = df["tokens"].map(tuple)
    return df


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("appsrc")
    day0 = make_tokens_table(600, seed=1)
    day1 = make_tokens_table(400, seed=2)
    # disjoint doc ids (day1 sorts after every day0 id) so union checks
    # are exact and range pruning can isolate the increment
    day1 = day1.set_column(
        day1.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array(["zzz/"] * day1.num_rows), day1["doc_id"], ""))
    p0, p1 = str(d / "day0.parquet"), str(d / "day1.parquet")
    pq.write_table(day0, p0)
    pq.write_table(day1, p1)
    return day0, day1, p0, p1


def test_append_after_initial_encode(corpus, ray_session, tmp_path):
    day0, day1, p0, p1 = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    s0 = append_dataset(p0, out, opts)            # creates the container
    assert s0["id_offset"] == 0
    s1 = append_dataset(p1, out, opts)            # appends past it
    assert s1["id_offset"] == s0["plan"]["n_parts"]
    records = mf.load_manifest(out)
    assert len(records) == (s0["plan"]["n_parts"] + s1["plan"]["n_parts"])
    # combined global manifest reflects BOTH increments
    g = json.loads(open(os.path.join(out, "_MANIFEST.json")).read())
    assert g["n_rows"] == day0.num_rows + day1.num_rows
    assert len(g["appends"]) == 2
    # decode sees the union, bit-identical per row
    got = _sorted_pd(pa.concat_tables(
        [pa.Table.from_pandas(b) for b in
         decode_dataset(out).iter_batches(batch_format="pandas")],
        promote_options="permissive"))
    want = _sorted_pd(pa.concat_tables([day0, day1]))
    assert got.equals(want[got.columns])


def test_append_same_increment_is_idempotent(corpus, ray_session, tmp_path):
    _, day1, p0, p1 = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    append_dataset(p0, out, opts)
    s1 = append_dataset(p1, out, opts)
    s2 = append_dataset(p1, out, opts)            # same files re-run
    assert s2["id_offset"] == s1["id_offset"]
    assert s2["skipped_partitions"] == s2["plan"]["n_parts"]  # all resumed
    assert s2["container"]["n_partitions"] == s1["container"]["n_partitions"]


def test_crash_mid_append_resumes_reserved_range(corpus, ray_session,
                                                 tmp_path):
    day0, day1, p0, p1 = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    s0 = append_dataset(p0, out, opts)
    s1 = append_dataset(p1, out, opts)
    # simulate the crash AFTER some partitions committed: delete the
    # append's last partition + its manifest record, reset the ledger
    # entry to pending (n_parts unknown, as a mid-encode crash leaves it)
    records = mf.load_manifest(out)
    last = max(records, key=lambda pid: int(pid[1:]))
    os.remove(records[last]["path"])
    os.remove(os.path.join(out, "_manifest", f"part-{last}.json"))
    # a DIFFERENT increment does NOT block on the crashed one: its claim
    # has a fixed extent, so the new append allocates past it (P59 —
    # the legacy unknown-extent ledger used to refuse here)
    s_other = append_dataset(p0, str(out), opts,
                             append_id="other-increment")
    assert s_other["id_offset"] >= s1["id_offset"] + s1["plan"]["n_parts"]
    # the SAME increment resumes: same base, missing partition re-encoded,
    # committed ones skipped
    s2 = append_dataset(p1, out, opts)
    assert s2["id_offset"] == s1["id_offset"]
    assert s2["skipped_partitions"] == s2["plan"]["n_parts"] - 1
    got = _sorted_pd(pa.concat_tables(
        [pa.Table.from_pandas(b) for b in
         decode_dataset(out).iter_batches(batch_format="pandas")],
        promote_options="permissive"))
    # "other-increment" re-appended day0's rows under new ids
    want = _sorted_pd(pa.concat_tables([day0, day1, day0]))
    assert got.equals(want[got.columns])


def test_dataset_input_requires_append_id(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_arrow(make_tokens_table(50, seed=3))
    with pytest.raises(ValueError, match="append_id"):
        append_dataset(ds, str(tmp_path / "c"))


def test_appended_container_range_pruning(corpus, ray_session, tmp_path):
    from parquet2_ray.pipelines.encode_pipeline import (
        prune_partitions_by_range,
    )

    day0, day1, p0, p1 = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    append_dataset(p0, out, opts)
    append_dataset(p1, out, opts)
    # day1 ids all start with "zzz/": a range probe above "zzz" must
    # prune every day0 partition (appended stats participate uniformly)
    keep = prune_partitions_by_range(out, "doc_id", lo="zzz")
    from parquet2_ray.pipelines.append_pipeline import _load_sessions

    n1 = _load_sessions(out)[1]["n_parts"]
    assert 0 < len(keep) <= n1
    lo_ids = pa.concat_tables(
        [pa.Table.from_pandas(b) for b in
         decode_dataset(out, key_range=("doc_id", "zzz", None))
         .iter_batches(batch_format="pandas")],
        promote_options="permissive")
    assert lo_ids.num_rows == day1.num_rows


def test_append_schema_mismatch_rejected(corpus, ray_session, tmp_path):
    import pyarrow.parquet as _pq

    _, _, p0, _ = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    append_dataset(p0, out, opts)
    bad = pa.table({"doc_id": pa.array(["a", "b"]),
                    "body": pa.array(["x", "y"])})
    badp = str(tmp_path / "bad.parquet")
    _pq.write_table(bad, badp)
    with pytest.raises(ValueError, match="schema mismatch"):
        append_dataset(badp, out, opts)
    # and nothing was reserved or committed for the rejected increment
    from parquet2_ray.pipelines.append_pipeline import _load_sessions

    assert len(_load_sessions(out)) == 1


def test_changed_increment_under_reused_id_aborts_before_write(
        corpus, ray_session, tmp_path):
    """A changed increment re-run under a finalized append_id must
    abort BEFORE any write — a post-hoc check would fire only after a
    larger plan had re-encoded over the NEXT append's committed ids."""
    day0, day1, p0, p1 = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    s0 = append_dataset(p0, out, opts, append_id="fixed-id")
    s1 = append_dataset(p1, out, opts)           # the neighbor
    before = {pid: r["fingerprint"]
              for pid, r in mf.load_manifest(out).items()}
    # "re-run" fixed-id with DIFFERENT content (p1's files => a different plan)
    big = str(tmp_path / "big.parquet")
    pq.write_table(pa.concat_tables([day0, day1]), big)
    with pytest.raises(RuntimeError, match="reused append_id"):
        append_dataset(big, out, opts, append_id="fixed-id")
    # nothing was overwritten: every committed fingerprint unchanged
    after = {pid: r["fingerprint"]
             for pid, r in mf.load_manifest(out).items()}
    assert after == before


def test_append_type_mismatch_rejected(corpus, ray_session, tmp_path):
    import pyarrow.parquet as _pq

    _, _, p0, _ = corpus
    out = str(tmp_path / "c")
    opts = EncodeOptions(target_weight=50_000, fsync=False)
    append_dataset(p0, out, opts)
    # same column NAMES, one different type (n_tok int64 vs int32)
    t = make_tokens_table(20, seed=8)
    t = t.set_column(t.column_names.index("n_tok"), "n_tok",
                     t["n_tok"].cast(pa.int64()))
    badp = str(tmp_path / "badtype.parquet")
    _pq.write_table(t, badp)
    with pytest.raises(ValueError, match="schema mismatch"):
        append_dataset(badp, out, opts)
