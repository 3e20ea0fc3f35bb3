"""Benchmark decontamination (stages/decontaminate.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.stages.decontaminate import (
    benchmark_fingerprints,
    decontaminate,
    flag_contaminated,
)

BENCH = [
    "What is the capital of France? Paris is the capital of France.",
    "The mitochondria is the powerhouse of the cell, as everyone knows.",
]


def _corpus():
    rng = np.random.default_rng(5)
    rand = lambda: "".join(chr(c) for c in rng.integers(97, 123, 120))
    rows = []
    for i in range(40):
        rows.append({"doc_id": f"clean-{i}", "text": rand()})
    # contaminated: full benchmark string embedded mid-document
    rows.append({"doc_id": "dirty-0", "text": rand() + BENCH[0] + rand()})
    rows.append({"doc_id": "dirty-1", "text": BENCH[1][:80] + rand()})
    # near miss: shares a few words but no 40-byte window
    rows.append({"doc_id": "nearmiss", "text": "The capital of France? " + rand()})
    rows.append({"doc_id": "empty", "text": ""})
    rows.append({"doc_id": "short", "text": "tiny"})
    return rows


def test_fingerprints_dedup_and_window_count():
    fp = benchmark_fingerprints(BENCH, k=40)
    expect = sum(len(t.encode()) - 39 for t in BENCH)
    assert 0 < len(fp) <= expect
    assert (np.diff(fp.view(np.uint64)) > 0).all()  # sorted unique
    assert benchmark_fingerprints([], k=40).size == 0
    assert benchmark_fingerprints(["ab"], k=40).size == 0  # shorter than k


@pytest.mark.usefixtures("ray_session")
def test_flag_and_drop_contaminated():
    rows = _corpus()
    ds = rd.from_items(rows)
    fp = benchmark_fingerprints(BENCH, k=40)
    flagged = flag_contaminated(ds, fp, k=40).to_pandas()
    bad = set(flagged[flagged["contaminated"]]["doc_id"])
    assert bad == {"dirty-0", "dirty-1"}
    # hit counts scale with embedded length (windows wholly inside)
    row = flagged.set_index("doc_id")
    assert row.loc["dirty-0", "n_contam_windows"] >= len(BENCH[0].encode()) - 39
    assert row.loc["nearmiss", "n_contam_windows"] == 0
    assert row.loc["empty", "n_contam_windows"] == 0

    clean = decontaminate(ds, BENCH, k=40)
    out = clean.to_pandas()
    assert set(out.columns) == {"doc_id", "text"}  # flags dropped
    assert set(out["doc_id"]) == {r["doc_id"] for r in rows} - bad


@pytest.mark.usefixtures("ray_session")
def test_min_hits_threshold_and_keep_flags():
    rows = _corpus()
    ds = rd.from_items(rows)
    # an absurd threshold keeps everything
    out = decontaminate(ds, BENCH, k=40, min_hits=10_000, keep_flags=True)
    df = out.to_pandas()
    assert len(df) == len(rows)
    assert "n_contam_windows" in df.columns and not df["contaminated"].any()


@pytest.mark.usefixtures("ray_session")
def test_boundary_windows_do_not_leak_across_docs():
    """A window spanning two adjacent docs in the same batch must not
    count, even if the concatenated bytes happen to match a benchmark."""
    bench_text = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcd"  # 40 bytes
    half1, half2 = bench_text[:20], bench_text[20:]
    ds = rd.from_items([
        {"doc_id": "a", "text": "x" * 30 + half1},
        {"doc_id": "b", "text": half2 + "y" * 30},
    ])
    flagged = flag_contaminated(
        ds, benchmark_fingerprints([bench_text], k=40), k=40).to_pandas()
    assert not flagged["contaminated"].any()


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_on_documents_table():
    """Real table: planting one documents row as the 'benchmark' drops
    exactly the rows containing that text."""
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    probe = None
    for t in tbl["text"].to_pylist():
        if t and len(t.encode()) >= 50:
            probe = t
            break
    assert probe is not None
    # scalar reference: a doc is contaminated iff its 50-byte window
    # set intersects the probe's (substring containment undercounts —
    # the synthetic vocab repeats windows across documents)
    def wins(t):
        b = t.encode()
        return {b[i:i + 50] for i in range(len(b) - 49)}

    probe_wins = wins(probe)
    n_match = sum(1 for t in tbl["text"].to_pylist()
                  if t and wins(t) & probe_wins)
    assert n_match >= 1
    clean = decontaminate(rd.from_arrow(tbl), [probe], k=50)
    assert clean.count() == tbl.num_rows - n_match
