"""End-to-end Ray Data pipeline tests: encode → manifest → decode → verify,
plus resume semantics (SURVEY.md §5 e2e + resume layers)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.verify_pipeline import (
    verify_against_source,
    verify_manifest,
)
from parquet2_ray.state import manifest as mf


@pytest.fixture(scope="module")
def encoded_dir(ray_session, tokens_table, tmp_path_factory):
    d = tmp_path_factory.mktemp("enc")
    src = d / "src.parquet"
    pq.write_table(tokens_table, src)
    out = str(d / "out")
    opts = EncodeOptions(target_weight=50_000)  # force multiple partitions
    summary = encode_dataset(str(src), out, opts)
    return tokens_table, out, summary


def test_encode_summary(encoded_dir):
    tbl, out, summary = encoded_dir
    assert summary["n_rows"] == tbl.num_rows
    assert summary["n_partitions"] > 4  # multiple sources × weight buckets
    assert summary["encoded_bytes"] < summary["raw_bytes"]
    assert summary["n_weight"] == pc.sum(tbl["n_tok"]).as_py()
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))


def test_manifest_records(encoded_dir):
    tbl, out, summary = encoded_dir
    records = mf.load_manifest(out)
    assert len(records) == summary["n_partitions"]
    for r in records.values():
        assert os.path.exists(r["path"])
        assert set(r["codecs"]) == {"doc_id", "tokens", "n_tok", "source"}
        assert r["fingerprint"]
        assert r["wall_s"] >= 0
        # lineage: every record carries per-column stats
        assert {p["column"] for p in r["profiles"]} == set(r["codecs"])


def test_decode_bit_identity(encoded_dir, ray_session):
    tbl, out, _ = encoded_dir
    assert verify_against_source(tbl, out, key="doc_id")


def test_verify_manifest_distributed(encoded_dir, ray_session):
    _, out, summary = encoded_dir
    res = verify_manifest(out)
    assert res["n_partitions"] == summary["n_partitions"]
    assert res["n_bad"] == 0


def test_decode_dataset_streams(encoded_dir, ray_session):
    tbl, out, _ = encoded_dir
    ds = decode_dataset(out)
    assert ds.count() == tbl.num_rows
    assert set(ds.schema().names) == set(tbl.column_names)


def test_partitions_grouped_by_source(encoded_dir):
    _, out, _ = encoded_dir
    # every partition must be single-source (groupby-on-source semantics)
    for r in mf.load_manifest(out).values():
        from parquet2_ray.stages.encode import decode_partition_path

        t = decode_partition_path(r["path"])
        assert len(pc.unique(t["source"])) == 1


def test_resume_skips_committed(encoded_dir, ray_session, tokens_table, tmp_path):
    tbl, out, first = encoded_dir
    # delete 2 partitions + their ledger rows → rerun must re-encode ONLY them
    records = sorted(mf.load_manifest(out).values(), key=lambda r: r["part_id"])
    victims = records[:2]
    for v in victims:
        os.remove(v["path"])
        os.remove(os.path.join(out, "_manifest", f"part-{v['part_id']}.json"))
    src = glob.glob(os.path.join(os.path.dirname(out), "src.parquet"))[0]
    summary2 = encode_dataset(src, out, EncodeOptions(target_weight=50_000))
    assert summary2["n_partitions"] == first["n_partitions"]
    assert summary2["skipped_partitions"] == first["n_partitions"] - 2
    # re-encoded partitions are byte-identical (deterministic retries)
    rec2 = mf.load_manifest(out)
    for v in victims:
        assert rec2[v["part_id"]]["fingerprint"] == v["fingerprint"]
        assert rec2[v["part_id"]]["encoded_bytes"] == v["encoded_bytes"]
    assert verify_against_source(tbl, out, key="doc_id")


def test_generic_table_without_token_schema(ray_session, tmp_path, rng):
    # a table lacking source/n_tok/doc_id must still encode (fallbacks)
    n = 3000
    tbl = pa.table(
        {
            "k": pa.array(range(n), type=pa.int64()),
            "val": pa.array(rng.normal(size=n)),
            "cat": pa.array([["x", "y", "z"][i % 3] for i in range(n)]),
        }
    )
    src = tmp_path / "g.parquet"
    pq.write_table(tbl, src)
    out = str(tmp_path / "gout")
    summary = encode_dataset(
        str(src), out, EncodeOptions(sort_key="k", target_rows=1000)
    )
    assert summary["n_rows"] == n
    assert verify_against_source(tbl, out, key="k")


def test_nullable_tokens_roundtrip(ray_session, tmp_path):
    """FIXTURES.md F1 nullable variant: 5% of ``tokens`` entries null —
    the reference's Optional (def-levels) path ↔ Arrow validity."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        decode_dataset,
        encode_dataset,
    )
    from parquet2_ray.sources.tokens import make_tokens_table

    tbl = make_tokens_table(1200, seed=11)
    rng = np.random.default_rng(0)
    null_mask = rng.random(len(tbl)) < 0.05
    tokens = tbl["tokens"].combine_chunks()
    idx = pa.array(np.arange(len(tbl)), type=pa.int64(),
                   mask=null_mask)  # null index → null element
    nullable = tokens.take(idx)
    assert nullable.null_count > 0
    tbl = tbl.set_column(tbl.schema.get_field_index("tokens"), "tokens", nullable)
    src = tmp_path / "nullable.parquet"
    pq.write_table(tbl, src)

    out = str(tmp_path / "enc")
    encode_dataset(str(src), out, EncodeOptions(target_weight=150_000))
    got = decode_dataset(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert got["tokens"].isna().sum() == want["tokens"].isna().sum() > 0
    for g, w in zip(got["tokens"], want["tokens"]):
        if w is None or (not isinstance(w, (list, np.ndarray)) and g is None):
            assert g is None or (not isinstance(g, (list, np.ndarray)))
        else:
            assert np.array_equal(np.asarray(g), np.asarray(w))


def test_edge_inputs_roundtrip(ray_session, tmp_path):
    """Empty table, single row, and an all-null column through the full
    pipeline (reference edge semantics: zero-value pages, Optional path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        decode_dataset,
        encode_dataset,
    )

    # single row with an all-null string column
    tbl = pa.table({
        "doc_id": pa.array(["only/one"]),
        "tokens": pa.array([[1, 2, 3]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([3], type=pa.int32()),
        "source": pa.array([None], type=pa.string()),
    })
    src = tmp_path / "one.parquet"
    pq.write_table(tbl, src)
    out = str(tmp_path / "enc1")
    s = encode_dataset(str(src), out, EncodeOptions())
    assert s["n_rows"] == 1
    got = decode_dataset(out).to_pandas()
    assert len(got) == 1 and got["source"].isna().all()
    assert np.array_equal(np.asarray(got["tokens"][0]), [1, 2, 3])

    # empty table
    empty = tbl.slice(0, 0)
    src2 = tmp_path / "empty.parquet"
    pq.write_table(empty, src2)
    out2 = str(tmp_path / "enc2")
    s2 = encode_dataset(str(src2), out2, EncodeOptions())
    assert s2["n_rows"] == 0


def test_hierarchical_exchange_bit_identical(ray_session, tokens_table,
                                             tmp_path):
    """Two-level exchange (hier_parts_threshold exceeded) must commit the
    exact same bytes as the flat exchange: same partitions, same
    fingerprints, same decoded rows."""
    src = tmp_path / "src.parquet"
    pq.write_table(tokens_table, src)
    flat_out, hier_out = str(tmp_path / "flat"), str(tmp_path / "hier")
    base = dict(target_weight=50_000)  # ~several partitions at 1000 rows
    s_flat = encode_dataset(str(src), flat_out, EncodeOptions(**base))
    s_hier = encode_dataset(
        str(src), hier_out,
        EncodeOptions(**base, hier_parts_threshold=1, hier_fan=3),
    )
    assert s_hier["plan"]["hierarchical"] is True
    assert s_flat["plan"]["hierarchical"] is False
    assert s_hier["n_partitions"] == s_flat["n_partitions"]
    assert s_hier["n_rows"] == s_flat["n_rows"]
    assert s_hier["encoded_bytes"] == s_flat["encoded_bytes"]
    rf = mf.load_manifest(flat_out)
    rh = mf.load_manifest(hier_out)
    assert sorted(rf) == sorted(rh)
    for k in rf:
        assert rf[k]["fingerprint"] == rh[k]["fingerprint"]
    got = decode_dataset(hier_out).to_arrow_refs()
    import ray as _ray
    import pyarrow as _pa
    tbl = _pa.concat_tables([_ray.get(r) for r in got])
    assert tbl.num_rows == tokens_table.num_rows


def test_compressed_float_pipeline_picks_float_transform(ray_session, tmp_path):
    """End-to-end: under block compression the selector picks a
    float-transform codec (ALP-RD since codecs/alp.py landed; BSS was
    the pre-ALP winner) for smooth float columns and the roundtrip is
    exact (beyond-reference encodings — parquet_bridge.rs:329 declares
    BYTE_STREAM_SPLIT unimplemented, ALP has no reference analog)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        decode_dataset,
        encode_dataset,
    )
    from parquet2_ray.state import manifest as mf

    rng = np.random.default_rng(11)
    n = 5000
    tbl = pa.table({
        "k": pa.array(np.arange(n)),
        "price": pa.array(rng.normal(100.0, 0.5, n)),  # smooth doubles
    })
    src = str(tmp_path / "f.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "enc")
    encode_dataset(src, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="k",
        target_rows=100_000, compression="zstd"))
    recs = mf.load_manifest(out)
    codecs = {c: k for r in recs.values() for c, k in r["codecs"].items()}
    assert codecs["price"] in ("byte_stream_split", "alp_rd")
    got = decode_dataset(out).to_pandas().sort_values("k", ignore_index=True)
    assert got["price"].tolist() == tbl["price"].to_pylist()


def test_pack_rg_items():
    from parquet2_ray.pipelines.encode_pipeline import _pack_rg_items

    meta = [("a", [100, 100, 100]), ("b", [50]), ("c", [300, 10])]
    # all row groups exactly once, contiguous per file, in order
    for target in (1, 2, 3, 6, 100):
        tasks = _pack_rg_items(meta, target)
        seen = [(p, rg) for t in tasks for p, rgs in t for rg in rgs]
        assert seen == [("a", 0), ("a", 1), ("a", 2), ("b", 0),
                        ("c", 0), ("c", 1)], target
    assert len(_pack_rg_items(meta, 100)) <= 6
    assert len(_pack_rg_items(meta, 1)) == 1
    # degenerate: zero-row files still covered
    z = _pack_rg_items([("a", [0, 0])], 4)
    assert [(p, rg) for t in z for p, rgs in t for rg in rgs] == [("a", 0), ("a", 1)]
    assert _pack_rg_items([], 4) == []


def test_nested_dir_discovery_and_schema_mismatch(ray_session, tokens_table,
                                                 tmp_path):
    """Fused path must find parquet files recursively (hive-style
    layouts) and reject heterogeneous schemas up front with the file
    named."""
    import pytest

    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset

    root = tmp_path / "data"
    (root / "sub").mkdir(parents=True)
    half = tokens_table.num_rows // 2
    pq.write_table(tokens_table.slice(0, half), root / "top.parquet")
    pq.write_table(tokens_table.slice(half), root / "sub" / "nested.parquet")
    out = str(tmp_path / "enc")
    s = encode_dataset(str(root), out, EncodeOptions(target_weight=200_000))
    assert s["n_rows"] == tokens_table.num_rows  # nested file not dropped

    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(tokens_table, bad / "a.parquet")
    pq.write_table(tokens_table.drop_columns(["n_tok"]), bad / "b.parquet")
    with pytest.raises(ValueError, match="schema mismatch.*b.parquet"):
        encode_dataset(str(bad), str(tmp_path / "enc2"), EncodeOptions())


def test_pack_rg_items_mass_cap():
    from parquet2_ray.pipelines.encode_pipeline import _pack_rg_items

    meta = [("a", [100] * 10)]
    tasks = _pack_rg_items(meta, 2, max_task_mass=250)
    # cap beats task-count target: no task above 250 mass
    assert all(sum(100 for _, rgs in t for _ in rgs) <= 250 for t in tasks)
    seen = [(p, rg) for t in tasks for p, rgs in t for rg in rgs]
    assert seen == [("a", i) for i in range(10)]
    # an oversized single row group still forms its own task
    t2 = _pack_rg_items([("a", [1000, 10])], 1, max_task_mass=100)
    assert [(p, rg) for t in t2 for p, rgs in t for rg in rgs] == [("a", 0), ("a", 1)]


def test_exact_removal_ids(ray_session):
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.pipelines.dedup_pipeline import exact_removal_ids

    df = pd.DataFrame({
        "doc_id": [5, 1, 2, 3, 4],
        "text": ["same", "same", "other", "same", "other"],
    })
    out = exact_removal_ids(rd.from_pandas(df)).to_pandas()
    # keepers: 1 ("same"), 2 ("other") → removals 3, 5 ("same"), 4 ("other")
    assert sorted(out["doc_id"].tolist()) == [3, 4, 5]


def test_dedup_corpus_end_to_end(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.pipelines.dedup_pipeline import dedup_corpus

    # disjoint per-doc vocabularies so unrelated docs share no shingles
    texts = [" ".join(f"w{d:02d}x{w:02d}" for w in range(40)) for d in range(30)]
    texts[20] = texts[0]                       # exact dup of 0
    texts[21] = texts[1]                       # exact dup of 1
    texts[22] = texts[2][:-7] + "ZZZZZZZ"      # near dup of 2
    df = pd.DataFrame({"doc_id": list(range(30)), "text": texts})
    for hasher, max_bucket in (("fast", 1024), ("md5", None)):
        out = dedup_corpus(rd.from_pandas(df), hasher=hasher,
                           max_bucket=max_bucket).to_pandas()
        kept = set(out["doc_id"])
        assert 20 not in kept and 21 not in kept      # exact dups removed
        assert 22 not in kept                         # near dup removed
        assert {0, 1, 2} <= kept                      # min-id keepers survive
        # no survivor pair shares identical text
        assert out["text"].nunique() == len(out)


def test_dedup_corpus_near_false_keeps_near_dups(ray_session):
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.pipelines.dedup_pipeline import dedup_corpus

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c d e f g h" * 4, "a b c d e f g h" * 4, "x y z w" * 8],
    })
    out = dedup_corpus(rd.from_pandas(df), near=False).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 2]


def test_int96_timestamps_ingest(ray_session, tmp_path):
    """Legacy Spark-written int96 timestamps (reference types.rs:47-113,
    julian->ns at :103-113): pyarrow surfaces INT96 as timestamp[ns] at
    read, which the container grammar carries natively — the encode
    pipeline must roundtrip a file written with
    use_deprecated_int96_timestamps bit-identically."""
    import numpy as np

    n = 2000
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1_000_000_000
                       + 1_500_000_000_000_000_000).cast(pa.timestamp("ns")),
    })
    src = tmp_path / "int96.parquet"
    pq.write_table(tbl, src, use_deprecated_int96_timestamps=True,
                   version="1.0")
    # confirm the file really carries INT96 physical type
    assert pq.ParquetFile(src).metadata.row_group(0).column(1).physical_type \
        == "INT96"
    out = str(tmp_path / "out96")
    encode_dataset(str(src), out, EncodeOptions(sort_key="k",
                                                target_rows=1000))
    got = (decode_dataset(out).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = tbl.to_pandas()
    assert (got["ts"].values == want["ts"].values).all()
