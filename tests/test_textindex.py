"""P67 full-text inverted index: build / probe / append / container search."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.textindex_pipeline import (
    append_text_index,
    build_text_index,
    probe_text_index,
    search_container,
    term_hashes,
)

DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 5, 6],
    "text": [
        "Alpha beta GAMMA",
        "beta gamma, delta!",
        "alpha alpha alpha",          # repeated term → one posting
        "delta epsilon",
        "",                           # empty doc → no postings
        "num3ric t0kens beta",
    ],
})


def _ref_sets():
    return {
        r.doc_id: {p for p in re.split(r"[^a-z0-9]+", r.text.lower()) if p}
        for r in DOCS.itertuples()
    }


def _ref(terms, mode):
    sets = _ref_sets()
    if mode == "and":
        return sorted(d for d, s in sets.items()
                      if all(t in s for t in terms))
    return sorted(d for d, s in sets.items()
                  if any(t in s for t in terms))


@pytest.fixture()
def index(tmp_path, ray_session):
    d = str(tmp_path / "tidx")
    stats = build_text_index(rd.from_pandas(DOCS), d, nshards=8)
    # distinct (term, doc) pairs: doc3 contributes ONE 'alpha' posting
    assert stats["postings"] == 3 + 3 + 1 + 2 + 0 + 3
    assert stats["terms"] == len(set().union(*_ref_sets().values()))
    return d


@pytest.mark.parametrize("terms,mode", [
    (["beta"], "and"),
    (["alpha"], "and"),
    (["beta", "gamma"], "and"),
    (["alpha", "delta"], "or"),
    (["t0kens"], "and"),
    (["beta", "gamma", "delta"], "and"),
])
def test_probe_matches_reference(index, terms, mode, ray_session):
    got = probe_text_index(index, terms, mode=mode)
    assert list(got) == _ref(terms, mode)


def test_probe_absent_term(index, ray_session):
    assert probe_text_index(index, ["zzz"], mode="and").size == 0
    # OR with one absent term still returns the present term's docs
    assert list(probe_text_index(index, ["zzz", "epsilon"],
                                 mode="or")) == _ref(["epsilon"], "or")


def test_probe_case_and_punctuation_normalized(index, ray_session):
    # query terms run through the same tokenizer as the corpus
    assert list(probe_text_index(index, ["GAMMA"], mode="and")) == \
        _ref(["gamma"], "and")


def test_multiword_query_term_rejected(index, ray_session):
    with pytest.raises(ValueError, match="tokenizes to"):
        probe_text_index(index, ["two words"])
    with pytest.raises(ValueError, match="tokenizes to"):
        term_hashes(["!!!"])


def test_max_postings_guard(index, ray_session):
    with pytest.raises(ValueError, match="max_postings"):
        probe_text_index(index, ["beta"], max_postings=2)
    with pytest.raises(ValueError, match="max_postings"):
        probe_text_index(index, ["beta", "alpha"], mode="or",
                         max_postings=2)
    # AND's guard is on the RAREST term: a selective second term makes
    # the same stop-word query affordable
    got = probe_text_index(index, ["beta", "epsilon"], max_postings=2)
    assert list(got) == _ref(["beta", "epsilon"], "and")


def test_append_equals_full_build(tmp_path, ray_session):
    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    build_text_index(rd.from_pandas(DOCS), full, nshards=8)
    build_text_index(rd.from_pandas(DOCS.iloc[:3]), inc, nshards=8)
    append_text_index(rd.from_pandas(DOCS.iloc[3:]), inc)
    for terms, mode in ([["beta"], "and"], [["alpha", "delta"], "or"],
                        [["beta", "gamma"], "and"]):
        assert list(probe_text_index(inc, terms, mode=mode)) == \
            list(probe_text_index(full, terms, mode=mode))


def test_append_is_idempotent(tmp_path, ray_session):
    d = str(tmp_path / "idem")
    build_text_index(rd.from_pandas(DOCS), d, nshards=8)
    r = append_text_index(rd.from_pandas(DOCS.iloc[1:2]), d,
                          on_existing="unchecked")
    assert r["added_postings"] == 0  # all (term, doc) pairs existed
    assert list(probe_text_index(d, ["beta"])) == _ref(["beta"], "and")


def test_append_guards_existing_ids(tmp_path, ray_session):
    """ADVICE r4: append is insert-only — a re-ingested id must be
    detected (default error) or routed through the purge path
    (on_existing='replace'), never left with stale postings."""
    import pytest

    d = str(tmp_path / "guard")
    build_text_index(rd.from_pandas(DOCS), d, nshards=8)
    changed = DOCS.iloc[1:2].assign(text="zeta omega")
    with pytest.raises(ValueError, match="already indexed"):
        append_text_index(rd.from_pandas(changed), d)
    # replace: the old content's postings are purged, new ones added
    append_text_index(rd.from_pandas(changed), d,
                      on_existing="replace")
    doc = int(DOCS.iloc[1]["doc_id"])
    assert doc not in set(probe_text_index(d, ["beta"]))
    assert list(probe_text_index(d, ["zeta"])) == [doc]
    # other documents untouched
    ref_beta = [i for i in _ref(["beta"], "and") if i != doc]
    assert list(probe_text_index(d, ["beta"])) == ref_beta


def test_rebuild_clears_stale_postings(tmp_path, ray_session):
    d = str(tmp_path / "reuse")
    build_text_index(rd.from_pandas(DOCS), d, nshards=8)
    small = DOCS.iloc[3:4]  # only "delta epsilon"
    build_text_index(rd.from_pandas(small), d, nshards=8)
    assert probe_text_index(d, ["beta"]).size == 0
    assert list(probe_text_index(d, ["delta"])) == [4]


def test_search_container_end_to_end(tmp_path, ray_session):
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )

    src = str(tmp_path / "docs.parquet")
    df = DOCS.assign(source="s", n_chars=DOCS.text.str.len())
    df.to_parquet(src)
    cont = str(tmp_path / "cont")
    encode_dataset(src, cont, EncodeOptions(
        group_col="source", weight_col="n_chars", sort_key="doc_id"))
    idx = str(tmp_path / "idx")
    build_text_index(rd.read_parquet(src, columns=["doc_id", "text"]),
                     idx, nshards=8)
    rows = search_container(cont, idx, ["beta", "gamma"],
                            columns=["doc_id", "text"]).take_all()
    assert sorted(r["doc_id"] for r in rows) == \
        _ref(["beta", "gamma"], "and")
    assert all(set(r) == {"doc_id", "text"} for r in rows)
    # no match → empty dataset, no error
    assert search_container(cont, idx, ["zzz"]).count() == 0


def test_index_on_object_store(tmp_path, ray_session):
    """The index commits through fsio: a file:// URI exercises the
    pyarrow-fs write path end-to-end (same route object stores take)."""
    d = "file://" + str(tmp_path / "fsidx")
    build_text_index(rd.from_pandas(DOCS), d, nshards=4)
    assert list(probe_text_index(d, ["beta", "gamma"])) == \
        _ref(["beta", "gamma"], "and")


def test_string_doc_ids(tmp_path, ray_session):
    """Code-review regression: non-numeric id columns (string doc
    ids) must build, append and probe — to_numpy on the doc column is
    not zero-copy for strings."""
    df = DOCS.assign(doc_id=[f"doc-{i}" for i in DOCS["doc_id"]])
    d = str(tmp_path / "sidx")
    build_text_index(rd.from_pandas(df), d, nshards=4)
    got = probe_text_index(d, ["beta", "gamma"])
    want = [f"doc-{i}" for i in _ref(["beta", "gamma"], "and")]
    assert sorted(got) == want
    append_text_index(rd.from_pandas(df.iloc[:2]), d,
                      on_existing="unchecked")  # idempotent
    assert sorted(probe_text_index(d, ["beta", "gamma"])) == want


# ----------------------- P73 ranked retrieval -----------------------

def _bm25_reference(terms, k1=1.5, b=0.75):
    """Scalar BM25 over DOCS with the module's tokenizer."""
    import math

    toks = {r.doc_id: [p for p in re.split(r"[^a-z0-9]+",
                                           r.text.lower()) if p]
            for r in DOCS.itertuples()}
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    scores = {}
    for t in terms:
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = math.log1p((N - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(t)
            if tf:
                dl = len(v)
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) \
                    / (tf + k1 * (1 - b + b * dl / avgdl))
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_ranked_search_matches_scalar_bm25(index, ray_session):
    from parquet2_ray.pipelines.textindex_pipeline import (
        ranked_search_index,
    )

    for terms in (["alpha"], ["alpha", "beta"],
                  ["beta", "delta", "zzz"]):
        got = ranked_search_index(index, terms, k=10)
        want = _bm25_reference(terms)
        assert got["doc"].to_pylist() == [d for d, _ in want]
        for gs, (_, ws) in zip(got["score"].to_pylist(), want):
            assert abs(gs - ws) < 1e-9
        assert got["rank"].to_pylist() == list(
            range(1, len(want) + 1))


def test_ranked_search_tf_saturation(index, ray_session):
    """doc 3 repeats 'alpha' 3× — it must outrank single-occurrence
    docs for the query 'alpha', but by less than 3× (saturation)."""
    from parquet2_ray.pipelines.textindex_pipeline import (
        ranked_search_index,
    )

    got = ranked_search_index(index, ["alpha"], k=10)
    scores = dict(zip(got["doc"].to_pylist(),
                      got["score"].to_pylist()))
    assert got["doc"][0].as_py() == 3          # highest tf wins
    assert scores[3] > scores[1]
    assert scores[3] < 3 * scores[1] * 1.5     # saturated, not linear


def test_ranked_search_after_refresh(tmp_path, ray_session):
    """Ranked retrieval stays correct through the CDC refresh: tf and
    doclen entries follow deletes and updates."""
    import ray.data as rd2

    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
        ranked_search_index,
        refresh_text_index,
    )

    import pyarrow as pa2

    src = str(tmp_path / "rsrc")
    df = DOCS.assign(grp="a")
    encode_dataset(rd2.from_arrow(pa2.Table.from_pandas(df)), src,
                   EncodeOptions(group_col="grp", weight_col=None,
                                 sort_key="doc_id"))
    idx = str(tmp_path / "ridx")
    index_container_text(src, idx, nshards=8)
    delete_rows(src, "doc_id", values=[3])   # drop the tf-heavy doc
    refresh_text_index(idx)
    got = ranked_search_index(idx, ["alpha"], k=10)
    assert 3 not in got["doc"].to_pylist()
    # reference over the remaining docs
    ref = str(tmp_path / "rref")
    index_container_text(src, ref, nshards=8)
    want = ranked_search_index(ref, ["alpha"], k=10)
    assert got["doc"].to_pylist() == want["doc"].to_pylist()
    for a, w in zip(got["score"].to_pylist(),
                    want["score"].to_pylist()):
        assert abs(a - w) < 1e-9


def test_search_container_ranked(tmp_path, ray_session):
    import ray.data as rd2

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.pipelines.textindex_pipeline import (
        build_text_index,
        search_container_ranked,
    )

    src = str(tmp_path / "csrc.parquet")
    df = DOCS.assign(source="s", n_chars=DOCS.text.str.len())
    df.to_parquet(src)
    cont = str(tmp_path / "ccont")
    encode_dataset(src, cont, EncodeOptions(
        group_col="source", weight_col="n_chars", sort_key="doc_id"))
    idx = str(tmp_path / "cidx")
    build_text_index(rd2.read_parquet(src, columns=["doc_id", "text"]),
                     idx, nshards=8)
    rows = search_container_ranked(cont, idx, ["alpha", "beta"], k=3,
                                   columns=["doc_id", "text"]).take_all()
    want = _bm25_reference(["alpha", "beta"])[:3]
    got = sorted(rows, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    assert all({"doc_id", "text", "score", "rank"} == set(r)
               for r in rows)


def test_ranked_columns_excluding_id(tmp_path, ray_session):
    """Code-review regression: a projection without the id column must
    not break the score attach (id is fetched internally, dropped)."""
    import ray.data as rd2

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.pipelines.textindex_pipeline import (
        build_text_index,
        search_container_ranked,
    )

    src = str(tmp_path / "cx.parquet")
    df = DOCS.assign(source="s", n_chars=DOCS.text.str.len())
    df.to_parquet(src)
    cont = str(tmp_path / "cxc")
    encode_dataset(src, cont, EncodeOptions(
        group_col="source", weight_col="n_chars", sort_key="doc_id"))
    idx = str(tmp_path / "cxi")
    build_text_index(rd2.read_parquet(src, columns=["doc_id", "text"]),
                     idx, nshards=4)
    rows = search_container_ranked(cont, idx, ["beta"], k=2,
                                   columns=["text"]).take_all()
    assert len(rows) == 2
    assert all(set(r) == {"text", "score", "rank"} for r in rows)


def test_pre_p73_shard_files_tolerated(tmp_path, ray_session):
    """Code-review regression: shard files without a tf column (built
    pre-P73) read back with tf=1 instead of KeyError."""
    import pyarrow.parquet as pq2

    from parquet2_ray.pipelines.textindex_pipeline import (
        _read_shard_file,
    )

    p = str(tmp_path / "old.parquet")
    pq2.write_table(pa.table({
        "h": pa.array([1, 2], pa.uint64()),
        "doc": pa.array([10, 20], pa.int64())}), p)
    t = _read_shard_file(p)
    assert t["tf"].to_pylist() == [1, 1]


def test_refresh_meta_counters_crash_safe(tmp_path, ray_session):
    """Code-review regression: ndocs/total_tokens are folded as
    per-shard ABSOLUTES — a crashed-then-rerun refresh window must not
    skew them (delta folds would double-apply)."""
    import json

    import ray.data as rd2

    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.pipelines.textindex_pipeline import (
        _index_meta,
        _meta_path,
        index_container_text,
        refresh_text_index,
    )
    from parquet2_ray.state import fsio

    src = str(tmp_path / "ms")
    df = DOCS.assign(grp="a")
    encode_dataset(rd2.from_arrow(pa.Table.from_pandas(df)), src,
                   EncodeOptions(group_col="grp", weight_col=None,
                                 sort_key="doc_id"))
    idx = str(tmp_path / "mi")
    index_container_text(src, idx, nshards=4)
    delete_rows(src, "doc_id", values=[1, 3])
    refresh_text_index(idx)
    m1 = _index_meta(idx)
    # crash before the cursor write: shard files already updated
    m1rw = dict(m1)
    m1rw["cursor"] = 0
    fsio.atomic_write(_meta_path(idx), json.dumps(m1rw).encode(),
                      fsync=False)
    refresh_text_index(idx)   # re-runs the same window
    m2 = _index_meta(idx)
    assert m2["ndocs"] == m1["ndocs"]
    assert m2["total_tokens"] == m1["total_tokens"]
    # and they equal a from-scratch rebuild's view of the corpus
    ref = str(tmp_path / "mr")
    index_container_text(src, ref, nshards=4)
    mr = _index_meta(ref)
    assert m2["ndocs"] == mr["ndocs"]
    assert m2["total_tokens"] == mr["total_tokens"]


def test_explain_terms(index, ray_session):
    from parquet2_ray.pipelines.textindex_pipeline import explain_terms

    info = explain_terms(index, ["alpha", "beta", "zzz"])
    sets = _ref_sets()
    assert info["terms"] == {
        t: sum(1 for s in sets.values() if t in s)
        for t in ("alpha", "beta", "zzz")}
    assert info["rarest"] == "zzz"
    assert info["and_fetch_mass"] == 0
    assert info["or_fetch_mass"] == sum(info["terms"].values())


# ------------------------- stoplist pruning -------------------------

def test_stoplist_drops_heavy_terms(tmp_path, ray_session):
    from parquet2_ray.pipelines.textindex_pipeline import (
        apply_stoplist,
        probe_text_index,
        ranked_search_index,
    )

    # 'common' in every doc; the rest are selective
    df = pd.DataFrame({
        "doc_id": list(range(1, 9)),
        "text": [f"common w{i % 4} extra{i}" for i in range(8)],
    })
    d = str(tmp_path / "stidx")
    build_text_index(rd.from_pandas(df), d, nshards=4)
    r = apply_stoplist(d, max_df=0.5)
    assert r["dropped_terms"] == 1   # only 'common' exceeds 50%
    # boolean probe on the stoplisted term raises clearly
    with pytest.raises(ValueError, match="stoplisted"):
        probe_text_index(d, ["common", "w1"])
    # selective terms unaffected
    assert list(probe_text_index(d, ["w1"])) == [2, 6]
    # ranked search silently skips the stoplisted term
    got = ranked_search_index(d, ["common", "w1"], k=5)
    assert set(got["doc"].to_pylist()) == {2, 6}
    # all-stoplisted ranked query → empty, not an error
    assert ranked_search_index(d, ["common"], k=5).num_rows == 0
    # idempotent re-apply
    r2 = apply_stoplist(d, max_df=0.5)
    assert r2["newly_dropped"] == 0
