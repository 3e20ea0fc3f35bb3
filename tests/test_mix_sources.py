"""Training-mixture resampling (stages/sampling.py mix_sources)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.stages.sampling import mix_sources, source_token_totals


def _tokens_ds():
    from parquet2_ray.sources.tokens import make_tokens_table

    return rd.from_arrow(make_tokens_table(4000, seed=2))


@pytest.mark.usefixtures("ray_session")
def test_source_totals_match_pandas():
    from parquet2_ray.sources.tokens import make_tokens_table

    tbl = make_tokens_table(4000, seed=2)
    got = source_token_totals(rd.from_arrow(tbl))
    ref = tbl.to_pandas().groupby("source")["n_tok"].sum().to_dict()
    assert got == {k: int(v) for k, v in ref.items()}


@pytest.mark.usefixtures("ray_session")
def test_downsample_hits_budget_and_is_deterministic():
    from parquet2_ray.sources.tokens import make_tokens_table

    tbl = make_tokens_table(4000, seed=2)
    totals = source_token_totals(rd.from_arrow(tbl))
    src = max(totals, key=totals.get)
    budget = {src: totals[src] // 3}
    out1, rep = mix_sources(_tokens_ds(), budget)
    df1 = out1.to_pandas()
    # only budgeted sources survive
    assert set(df1["source"]) == {src}
    # expected tokens ≈ budget (binomial; 4σ tolerance)
    got = df1["n_tok"].sum()
    p = rep[src]["rate"]
    sigma = np.sqrt(totals[src] * p * (1 - p) * 4)  # crude doc-weight bound
    assert abs(got - budget[src]) < max(6 * sigma, 0.2 * budget[src])
    # deterministic: same seed → identical kept set
    out2, _ = mix_sources(_tokens_ds(), budget)
    assert sorted(out2.to_pandas()["doc_id"]) == sorted(df1["doc_id"])
    # different seed → different set
    out3, _ = mix_sources(_tokens_ds(), budget, seed=1)
    assert sorted(out3.to_pandas()["doc_id"]) != sorted(df1["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_upsample_repeats_docs():
    from parquet2_ray.sources.tokens import make_tokens_table

    tbl = make_tokens_table(2000, seed=4)
    totals = source_token_totals(rd.from_arrow(tbl))
    src = min(totals, key=totals.get)
    budget = {src: int(totals[src] * 2.5)}
    out, rep = mix_sources(rd.from_arrow(tbl), budget, upsample=True)
    df = out.to_pandas()
    assert rep[src]["rate"] == pytest.approx(2.5, abs=1e-6)
    counts = df.groupby("doc_id").size()
    assert set(counts.unique()) <= {2, 3}
    got = df["n_tok"].sum()
    assert abs(got - budget[src]) < 0.25 * budget[src]
    # without upsample the rate caps at 1 (no duplicates)
    out_c, rep_c = mix_sources(rd.from_arrow(tbl), budget, upsample=False)
    assert rep_c[src]["rate"] == 1.0
    assert out_c.to_pandas().groupby("doc_id").size().max() == 1


@pytest.mark.usefixtures("ray_session")
def test_scalar_reference_membership():
    """Row-level keep decision matches the md5 scalar reference."""
    import hashlib

    from parquet2_ray.sources.tokens import make_tokens_table

    tbl = make_tokens_table(1500, seed=6)
    totals = source_token_totals(rd.from_arrow(tbl))
    src = sorted(totals)[0]
    budget = {src: totals[src] // 2}
    out, rep = mix_sources(rd.from_arrow(tbl), budget, seed=3)
    kept = set(out.to_pandas()["doc_id"])
    rate = rep[src]["rate"]
    for row in tbl.to_pylist()[:400]:
        if row["source"] != src:
            assert row["doc_id"] not in kept
            continue
        h = hashlib.md5(f"3:{row['doc_id']}".encode()).hexdigest()
        expect = int(h[:8], 16) / 2**32 < rate
        assert (row["doc_id"] in kept) == expect
