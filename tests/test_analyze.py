"""P68 ANALYZE: persisted column stats — NDV/quantile sketches +
exact metadata folds, incremental refresh, planning estimators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.analyze_pipeline import (
    analyze_container,
    estimate_distinct,
    estimate_range_rows,
    explain_read,
    load_stats,
)
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    encode_dataset,
)

N = 4000


def _table() -> pa.Table:
    vals = np.random.default_rng(7).normal(100.0, 15.0, N)
    ids = np.arange(N, dtype=np.int64)
    # range-based groups (not id % 4) so partitions are id-disjoint
    # and explain_read's min/max pruning has something to prune
    cat = np.array(["a", "b", "c", "d"])[ids // (N // 4)]
    nullable = pd.array(
        np.where(ids % 10 == 0, None, ids % 37), dtype="Int64")
    return pa.table({
        "id": pa.array(ids),
        "grp": pa.array(cat),
        "val": pa.array(vals),
        "mod37": pa.array(nullable, pa.int64()),
        "w": pa.array(np.ones(N, np.int64)),
    })


@pytest.fixture()
def container(tmp_path, ray_session):
    out = str(tmp_path / "cont")
    encode_dataset(rd.from_arrow(_table()), out, EncodeOptions(
        group_col="grp", weight_col="w", sort_key="id",
        target_weight=600))
    return out


def test_exact_metadata_fold(container, ray_session):
    doc = analyze_container(container)
    df = _table().to_pandas()
    assert doc["rows"] == N
    for c in ["id", "grp", "val", "mod37"]:
        cs = doc["columns"][c]
        assert cs["null_count"] == int(df[c].isna().sum())
        assert cs["min"] == df[c].dropna().min()
        assert cs["max"] == df[c].dropna().max()


def test_ndv_within_hll_tolerance(container, ray_session):
    doc = analyze_container(container)
    df = _table().to_pandas()
    for c in ["id", "grp", "val", "mod37"]:
        exact = df[c].nunique()
        est = estimate_distinct(doc, c)
        assert abs(est - exact) / max(exact, 1) < 0.06, (c, est, exact)


def test_quantiles_and_range_estimate(container, ray_session):
    analyze_container(container)
    stats = load_stats(container)
    df = _table().to_pandas()
    q = stats["columns"]["val"]["quantiles"]
    for pct in ("0.25", "0.5", "0.9"):
        exact = df["val"].quantile(float(pct))
        # rank error ~2/compression → value error bounded via density
        assert abs(q[pct] - exact) < 2.0, (pct, q[pct], exact)
    lo, hi = 90.0, 110.0
    exact = int(((df.val >= lo) & (df.val <= hi)).sum())
    est = estimate_range_rows(stats, "val", lo, hi)
    assert abs(est - exact) / exact < 0.08
    # open bounds
    assert abs(estimate_range_rows(stats, "val", None, None) - N) < 1
    # non-numeric column has no digest
    with pytest.raises(ValueError, match="no digest"):
        estimate_range_rows(stats, "grp", 0, 1)


def test_column_projection(container, ray_session):
    doc = analyze_container(container, columns=["id", "val"])
    assert set(doc["sketches"]) == {"id", "val"}
    assert "grp" not in doc["columns"]


def test_incremental_matches_full(tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset

    t = _table()
    out = str(tmp_path / "inc")
    encode_dataset(rd.from_arrow(t.slice(0, N // 2)), out,
                   EncodeOptions(group_col="grp", weight_col="w",
                                 sort_key="id", target_weight=600))
    analyze_container(out)
    append_dataset(rd.from_arrow(t.slice(N // 2)), out,
                   append_id="analyze-inc-test")
    inc = analyze_container(out, incremental=True)
    full = analyze_container(out, incremental=False)
    assert inc["rows"] == full["rows"] == N
    assert sorted(inc["covered"]) == sorted(full["covered"])
    for c in ["id", "grp", "val", "mod37"]:
        a, b = inc["columns"][c], full["columns"][c]
        assert a["null_count"] == b["null_count"]
        assert a["min"] == b["min"] and a["max"] == b["max"]
        # both sketches see the same value set; estimates agree closely
        assert abs(a["ndv"] - b["ndv"]) / max(b["ndv"], 1) < 0.02
    # a second incremental pass with nothing new is a no-op fold
    again = analyze_container(out, incremental=True)
    assert again["columns"]["id"]["ndv"] == inc["columns"]["id"]["ndv"]


def test_explain_read_prunes_and_estimates(container, ray_session):
    analyze_container(container)
    plan = explain_read(container, "id", 0, 199)
    assert plan["partitions_read"] < plan["partitions_total"]
    # ids are uniform 0..N-1: the 200-wide range ≈ 200 rows
    assert abs(plan["rows_estimated"] - 200) / 200 < 0.25
    assert 0 < plan["selectivity"] < 0.2
    # no-stats column still explains partition pruning
    plan2 = explain_read(container, "grp", "a", "a")
    assert plan2["rows_estimated"] is None
    assert plan2["partitions_read"] <= plan2["partitions_total"]


def test_stats_reflect_deletion_vectors(container, ray_session):
    """ANALYZE reads through dv masks: deleted rows leave the stats."""
    from parquet2_ray.pipelines.delete_pipeline import delete_rows

    analyze_container(container)
    delete_rows(container, "id", lo=0, hi=N // 2 - 1, mode="dv")
    doc = analyze_container(container)  # rebuild over the masked view
    assert doc["rows"] == N - N // 2
    assert doc["columns"]["id"]["min"] == N // 2
    est = estimate_distinct(doc, "id")
    assert abs(est - N // 2) / (N // 2) < 0.06


def test_estimates_stable_across_compaction_cycles(tmp_path,
                                                   ray_session):
    """Code-review regression: incremental re-analysis after a
    compaction (which rewrites every partition under new ids) must not
    inflate range estimates — the estimator scales by the exact record
    row count, not the sketch's fold count."""
    from parquet2_ray.pipelines.compact_pipeline import compact_container

    out = str(tmp_path / "cyc")
    encode_dataset(rd.from_arrow(_table()), out, EncodeOptions(
        group_col="grp", weight_col="w", sort_key="id",
        target_weight=600))
    analyze_container(out)
    base = estimate_range_rows(load_stats(out), "id", 0, N - 1)
    for _ in range(2):
        compact_container(out, target_weight=10**9)
        analyze_container(out, incremental=True)
    after = estimate_range_rows(load_stats(out), "id", 0, N - 1)
    assert abs(after - base) / base < 0.02
    assert after <= N * 1.01   # never exceeds the container


def test_incremental_new_column_refused(tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset

    out = str(tmp_path / "newcol")
    t = _table()
    encode_dataset(rd.from_arrow(t), out, EncodeOptions(
        group_col="grp", weight_col="w", sort_key="id",
        target_weight=600))
    analyze_container(out, columns=["id"])
    append_dataset(rd.from_arrow(t.slice(0, 10)), out,
                   append_id="an-newcol")
    with pytest.raises(ValueError, match="previous analyze"):
        analyze_container(out, columns=["id", "val"], incremental=True)


def test_analyze_stats_doc_on_container(container, ray_session):
    """The stats document round-trips through fsio (atomic write +
    read) and the sketch payloads survive the b64/zstd cycle —
    loading after an incremental no-op fold returns identical
    estimates."""
    d1 = analyze_container(container)
    d2 = analyze_container(container, incremental=True)  # no new parts
    for c in ("id", "val"):
        assert d1["columns"][c]["ndv"] == d2["columns"][c]["ndv"]
        assert d1["columns"][c]["quantiles"] == \
            d2["columns"][c]["quantiles"]
