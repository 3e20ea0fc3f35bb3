"""P77 multi-format corpus ingest: jsonl / csv / arrow route into the
same encode pipeline as parquet with identical results."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.sources.readers import read_corpus


def _df(n=200):
    rng = np.random.default_rng(55)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i} body word{i % 7}" for i in range(n)],
        "n_chars": rng.integers(10, 500, n),
        "source": np.array(["web", "code"])[np.arange(n) % 2],
    })


def _encode_and_read(ds_or_path, out):
    encode_dataset(ds_or_path, out, EncodeOptions(
        group_col="source", weight_col="n_chars", sort_key="doc_id"))
    return (pd.DataFrame(decode_dataset(out).take_all())
            .sort_values("doc_id").reset_index(drop=True))


def test_jsonl_roundtrip_equals_parquet(tmp_path, ray_session):
    df = _df()
    pq_path = str(tmp_path / "c.parquet")
    df.to_parquet(pq_path)
    jl_path = str(tmp_path / "c.jsonl")
    with open(jl_path, "w") as f:
        for r in df.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    want = _encode_and_read(pq_path, str(tmp_path / "outp"))
    got = _encode_and_read(read_corpus(jl_path, fmt="jsonl"),
                           str(tmp_path / "outj"))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_csv_roundtrip(tmp_path, ray_session):
    df = _df()
    cs = str(tmp_path / "c.csv")
    df.to_csv(cs, index=False)
    got = _encode_and_read(read_corpus(cs, fmt="csv"),
                           str(tmp_path / "outc"))
    pd.testing.assert_frame_equal(
        got[df.columns.tolist()],
        df.sort_values("doc_id").reset_index(drop=True))


def test_arrow_ipc_roundtrip(tmp_path, ray_session):
    df = _df()
    t = pa.Table.from_pandas(df, preserve_index=False)
    ap = str(tmp_path / "c.arrow")
    with ipc.new_file(ap, t.schema) as w:
        w.write_table(t)
    got = _encode_and_read(read_corpus(ap, fmt="arrow"),
                           str(tmp_path / "outa"))
    pd.testing.assert_frame_equal(
        got[df.columns.tolist()],
        df.sort_values("doc_id").reset_index(drop=True))


def test_arrow_ipc_stream_format(tmp_path, ray_session):
    """ADVICE r4: the 'ipc' alias advertises stream/file dumps — a
    stream-format file (no footer) must load via the fallback."""
    df = _df(60)
    t = pa.Table.from_pandas(df, preserve_index=False)
    sp = str(tmp_path / "c.ipc")
    with ipc.new_stream(sp, t.schema) as w:
        w.write_table(t)
    got = pd.DataFrame(read_corpus(sp, fmt="ipc").take_all()) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[df.columns.tolist()],
        df.sort_values("doc_id").reset_index(drop=True))


def test_unknown_format_rejected(ray_session):
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_corpus("/tmp/x", fmt="orc")


def test_projection(tmp_path, ray_session):
    df = _df(50)
    jl = str(tmp_path / "p.jsonl")
    with open(jl, "w") as f:
        for r in df.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    ds = read_corpus(jl, fmt="jsonl", columns=["doc_id", "text"])
    rows = ds.take_all()
    assert set(rows[0]) == {"doc_id", "text"}
