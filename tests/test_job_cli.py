"""`python -m parquet2_ray.job` — the ray-job-submit entry point."""

import json

import pyarrow.parquet as pq
import pytest

from parquet2_ray.job import main


@pytest.mark.usefixtures("ray_session")
def test_job_encode_verify_decode(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    pq.write_table(make_tokens_table(1500, seed=4), src)
    cont = str(tmp_path / "cont")
    out = str(tmp_path / "pq")

    # encode (ray already initialized by the session fixture — the CLI
    # must not re-init)
    assert main(["encode", "--input", str(src), "--output", cont,
                 "--target-weight", "200000"]) == 0
    enc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert enc["n_rows"] == 1500 and enc["n_partitions"] >= 1

    # verify: distributed fingerprint check, zero bad partitions
    assert main(["verify", "--container", cont]) == 0
    ver = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ver["n_bad"] == 0 and ver["n_partitions"] == enc["n_partitions"]

    # decode to standard parquet
    assert main(["decode", "--input", cont, "--output", out]) == 0
    dec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dec["rows"] == 1500
    assert pq.read_table(out).num_rows == 1500
