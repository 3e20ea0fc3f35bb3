"""Crash-safety evidence: the per-partition encode contract
(deterministic canonical order + atomic commit + resume probe) must
survive REAL worker death, not just clean re-runs.

The flaky task below dies with os._exit mid-"encode" — after dirtying
the output dir with a partial .tmp file, exactly what a crash between
write and rename leaves behind — and Ray's task-retry machinery
re-runs it on a fresh worker.  The committed bytes must equal a
crash-free run's bytes bit-for-bit."""

import os

import pyarrow as pa
import pytest

import ray


@pytest.mark.usefixtures("ray_session")
def test_worker_death_mid_encode_retries_to_identical_bytes(tmp_path):
    from parquet2_ray.sources.tokens import make_tokens_table
    from parquet2_ray.stages.encode import decode_partition_path

    tbl = make_tokens_table(1200, seed=31)
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")
    marker = str(tmp_path / "crashed-once")
    os.makedirs(clean_dir)
    os.makedirs(crash_dir)

    @ray.remote(max_retries=2)
    def encode_task(blob: bytes, out_dir: str, crash_marker: str | None):
        import os as _os

        import pyarrow as _pa

        from parquet2_ray.stages.encode import encode_partition_table

        t = _pa.ipc.open_stream(blob).read_all()
        if crash_marker is not None and not _os.path.exists(crash_marker):
            open(crash_marker, "w").close()
            # leave the debris of a crash between write and rename
            with open(_os.path.join(out_dir, "part-p0.bin.tmp.999"), "wb") as f:
                f.write(b"partial garbage from the dead attempt")
            _os._exit(1)  # hard worker death — not an exception
        rec = encode_partition_table(t, out_dir, sort_key="doc_id",
                                     weight_col="n_tok", fsync=False)
        return rec.to_pylist()[0]

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    blob = sink.getvalue().to_pybytes()

    rec_clean = ray.get(encode_task.remote(blob, clean_dir, None))
    rec_crash = ray.get(encode_task.remote(blob, crash_dir, marker))

    assert os.path.exists(marker), "the crash injection never fired"
    assert rec_crash["fingerprint"] == rec_clean["fingerprint"]
    assert rec_crash["encoded_bytes"] == rec_clean["encoded_bytes"]
    with open(rec_clean["path"], "rb") as f1, \
            open(rec_crash["path"], "rb") as f2:
        assert f1.read() == f2.read(), "retry produced different bytes"
    # the dead attempt's tmp debris is ignored by decode and resume
    dec = decode_partition_path(rec_crash["path"])
    assert dec.num_rows == tbl.num_rows
    rec_again = ray.get(encode_task.remote(blob, crash_dir, None))
    assert rec_again["skipped"] is True  # resume probe unaffected


@pytest.mark.usefixtures("ray_session")
def test_job_level_resume_after_partial_wipe(tmp_path):
    """Kill a finished job's outputs halfway (as a mid-job crash would
    leave them) — the re-run re-encodes ONLY the missing partitions and
    every fingerprint matches the first run."""
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.state import manifest as mf
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    pq.write_table(make_tokens_table(3000, seed=33), src)
    out = str(tmp_path / "cont")
    encode_dataset(str(src), out, EncodeOptions(target_weight=150_000))
    first = mf.load_manifest(out)
    assert len(first) >= 4

    # crash aftermath: half the partitions lose their data file, one of
    # them also loses its manifest record, and tmp debris remains
    victims = sorted(first)[: len(first) // 2]
    for pid in victims:
        os.remove(first[pid]["path"])
    os.remove(os.path.join(out, "_manifest", f"part-{victims[0]}.json"))
    with open(os.path.join(out, "part-zzz.bin.tmp.42"), "wb") as f:
        f.write(b"debris")

    s2 = encode_dataset(str(src), out, EncodeOptions(target_weight=150_000))
    assert s2["skipped_partitions"] == len(first) - len(victims)
    second = mf.load_manifest(out)
    assert {p: r["fingerprint"] for p, r in second.items()} == \
        {p: r["fingerprint"] for p, r in first.items()}
