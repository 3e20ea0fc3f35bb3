"""P2RDatasink: exchange-free container writes via write_datasink."""

import json
import os

import pyarrow.parquet as pq
import pytest

import ray.data as rd


@pytest.mark.usefixtures("ray_session")
def test_write_datasink_roundtrip(tmp_path):
    from parquet2_ray.pipelines.encode_pipeline import decode_dataset
    from parquet2_ray.sources.datasink import P2RDatasink
    from parquet2_ray.sources.tokens import make_tokens_table

    tbl = make_tokens_table(2000, seed=51)
    out = str(tmp_path / "sink")
    ds = rd.from_arrow(tbl).repartition(5)
    ds.write_datasink(P2RDatasink(out, sort_key="doc_id",
                                  weight_col="n_tok", fsync=False))

    # full per-partition contract: manifest records + global manifest
    from parquet2_ray.state import manifest as mf

    records = mf.load_manifest(out)
    assert len(records) >= 2  # one per non-empty written block
    assert sum(r["n_rows"] for r in records.values()) == tbl.num_rows
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        g = json.load(f)
    assert g["n_rows"] == tbl.num_rows and g["writer"] == "P2RDatasink"

    # decode is value-identical to the input
    dec = decode_dataset(out).to_pandas().sort_values("doc_id")
    ref = tbl.to_pandas().sort_values("doc_id")
    assert dec["doc_id"].tolist() == ref["doc_id"].tolist()
    assert [list(x) for x in dec["tokens"]] == [list(x) for x in ref["tokens"]]

    # and the bit-identity verifier accepts the sink's containers
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0

    # datasource reads the sink's output too (both native APIs compose)
    from parquet2_ray.sources.datasource import P2RDatasource

    assert rd.read_datasource(P2RDatasource(out)).count() == tbl.num_rows


@pytest.mark.usefixtures("ray_session")
def test_write_datasink_pandas_blocks_and_empty(tmp_path):
    import pandas as pd

    from parquet2_ray.sources.datasink import P2RDatasink
    from parquet2_ray.state import manifest as mf

    out = str(tmp_path / "sink2")
    df = pd.DataFrame({"doc_id": range(50), "v": [float(i) for i in range(50)]})
    rd.from_pandas(df).repartition(3).write_datasink(
        P2RDatasink(out, sort_key="doc_id", fsync=False))
    records = mf.load_manifest(out)
    assert sum(r["n_rows"] for r in records.values()) == 50
