"""Randomized sidecar-convergence stress: a source container under a
random DML stream, with a materialized view, a text index and a
vector index registered — after EVERY maintenance point each sidecar
must equal its from-scratch reference.  The sidecar twin of the
maintenance-family lifecycle stress."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.container_agg import aggregate_clustered
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)

WORDS = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                  "zeta", "eta", "theta"])


def _rows(rng, ids):
    n = len(ids)
    texts = [" ".join(rng.choice(WORDS, size=rng.integers(2, 6)))
             for _ in range(n)]
    emb = [list(map(float, r)) for r in rng.normal(size=(n, 6))]
    return pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(texts),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
        "v": pa.array(rng.normal(5, 2, n)),
        "grp": pa.array((np.asarray(ids) % 3).astype(str)),
    })


def _check_view(src, view):
    full = (aggregate_clustered(src, "grp", {"v": ["sum", "count"]})
            .to_pandas().sort_values("grp").reset_index(drop=True))
    vdf = (pd.DataFrame(decode_dataset(view).take_all())
           .drop(columns=["_vbucket"]).sort_values("grp")
           .reset_index(drop=True)[full.columns.tolist()])
    pd.testing.assert_frame_equal(vdf, full)


def _check_text(src, tidx, tmp_path, tag):
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
        probe_text_index,
        ranked_search_index,
    )

    ref = str(tmp_path / f"tref-{tag}")
    index_container_text(src, ref, nshards=4)
    for w in ("alpha", "delta", "theta"):
        assert list(probe_text_index(tidx, [w])) == \
            list(probe_text_index(ref, [w])), (tag, w)
    got = ranked_search_index(tidx, ["beta", "gamma"], k=5)
    want = ranked_search_index(ref, ["beta", "gamma"], k=5)
    assert got["doc"].to_pylist() == want["doc"].to_pylist(), tag
    for a, b in zip(got["score"].to_pylist(), want["score"].to_pylist()):
        assert abs(a - b) < 1e-9, tag


def _check_vec(src, vidx, rng):
    from parquet2_ray.pipelines.vecindex_pipeline import (
        ann_search_index,
    )
    from parquet2_ray.stages.similarity import ann_topk

    rows = decode_dataset(src, columns=["embedding"]).take(3)
    q = np.stack([np.asarray(r["embedding"], np.float64)
                  for r in rows])
    exact = ann_topk(decode_dataset(
        src, columns=["doc_id", "embedding"]), q, [1, 2, 3], k=5,
        id_col="doc_id")
    got = ann_search_index(vidx, q, [1, 2, 3], k=5, nprobe=4)
    assert got.equals(exact)


@pytest.mark.parametrize("seed", [101, 202])
def test_randomized_sidecar_convergence(tmp_path, ray_session, seed):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.maintain_pipeline import (
        maintain_container,
    )
    from parquet2_ray.pipelines.matview_pipeline import create_agg_view
    from parquet2_ray.pipelines.sidecar_registry import (
        refresh_sidecars,
    )
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
    )
    from parquet2_ray.pipelines.upsert_pipeline import upsert_rows
    from parquet2_ray.pipelines.vecindex_pipeline import (
        build_vector_index,
    )

    rng = np.random.default_rng(seed)
    src = str(tmp_path / "src")
    live = list(range(60))
    encode_dataset(rd.from_arrow(_rows(rng, live)), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="doc_id"))
    view = str(tmp_path / "view")
    tidx = str(tmp_path / "tidx")
    vidx = str(tmp_path / "vidx")
    create_agg_view(src, view, "grp", {"v": ["sum", "count"]})
    index_container_text(src, tidx, nshards=4)
    build_vector_index(src, vidx, id_col="doc_id", n_centroids=4)
    next_id = 1000

    for step in range(5):
        op = rng.choice(["append", "delete", "upsert", "maintain"])
        if op == "append":
            k = int(rng.integers(5, 15))
            ids = list(range(next_id, next_id + k))
            next_id += k
            live += ids
            append_dataset(rd.from_arrow(_rows(rng, ids)), src,
                           append_id=f"st-{seed}-{step}")
        elif op == "delete" and len(live) > 20:
            kill = sorted(rng.choice(live, size=8, replace=False))
            live = [i for i in live if i not in set(kill)]
            delete_rows(src, "doc_id", values=[int(x) for x in kill],
                        mode=rng.choice(["rewrite", "dv"]))
        elif op == "upsert" and live:
            pick = sorted(rng.choice(live, size=5, replace=False))
            upsert_rows(src, rd.from_arrow(
                _rows(rng, [int(x) for x in pick])), "doc_id",
                upsert_id=f"st-u-{seed}-{step}")
        else:
            # maintain refreshes the sidecars itself (P72 ordering)
            maintain_container(src)
        res = refresh_sidecars(src)
        for path, r in res.items():
            assert "error" not in r, (step, op, path, r)
        _check_view(src, view)
        _check_text(src, tidx, tmp_path, f"{seed}-{step}")
        _check_vec(src, vidx, rng)
