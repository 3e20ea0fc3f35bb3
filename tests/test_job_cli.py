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


@pytest.mark.usefixtures("ray_session")
def test_job_dedup_and_prepare(tmp_path, capsys):
    import pandas as pd
    import pyarrow as pa

    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 3,
        1: "the quick brown fox jumps over the lazy dog " * 3,  # dup of 0
        2: "something else entirely with distinct words here",
    }
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                             "text": pa.array(list(texts.values()))}), src)

    out = str(tmp_path / "deduped")
    assert main(["dedup", "--input", str(src), "--output", out,
                 "--exact-only"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 2
    kept = pq.read_table(out)["doc_id"].to_pylist()
    assert sorted(kept) == [0, 2]

    cont = str(tmp_path / "prepared")
    assert main(["prepare", "--input", str(src), "--output", cont,
                 "--max-len", "32"]) == 0
    prep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prep["kept_docs"] == 2 and prep["packed_rows"] >= 1


@pytest.mark.usefixtures("ray_session")
def test_job_encode_append(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    day0, day1 = tmp_path / "d0.parquet", tmp_path / "d1.parquet"
    pq.write_table(make_tokens_table(800, seed=5), day0)
    pq.write_table(make_tokens_table(300, seed=6), day1)
    cont = str(tmp_path / "cont")
    assert main(["encode", "--input", str(day0), "--output", cont,
                 "--target-weight", "200000", "--append"]) == 0
    s0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["encode", "--input", str(day1), "--output", cont,
                 "--target-weight", "200000", "--append"]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["id_offset"] == s0["container"]["n_partitions"]
    assert s1["container"]["n_rows"] == 1100
    # full-container verify covers both increments
    assert main(["verify", "--container", cont]) == 0
    ver = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ver["n_bad"] == 0
    assert ver["n_partitions"] == s1["container"]["n_partitions"]


@pytest.mark.usefixtures("ray_session")
def test_job_append_jsonl_rewritten_in_place(tmp_path, capsys):
    """ADVICE r4 medium: a Dataset-routed (non-parquet) append whose
    input file was REWRITTEN at the same path must get a fresh
    append_id (stat-derived), not resume the stale reservation and
    silently drop the new rows."""
    import pandas as pd

    def write_jsonl(path, lo, hi):
        df = pd.DataFrame({
            "doc_id": range(lo, hi),
            "text": [f"doc {i} body" for i in range(lo, hi)],
            "n_chars": [50] * (hi - lo),
            "source": ["web"] * (hi - lo),
        })
        with open(path, "w") as f:
            for r in df.to_dict("records"):
                f.write(json.dumps(r) + "\n")

    src = tmp_path / "day.jsonl"
    cont = str(tmp_path / "cont")
    write_jsonl(src, 0, 100)
    assert main(["encode", "--input", str(src), "--output", cont,
                 "--input-format", "jsonl", "--group-col", "source",
                 "--weight-col", "n_chars", "--sort-key", "doc_id",
                 "--target-weight", "100000", "--append"]) == 0
    capsys.readouterr()
    # same path, same row count (so the resumed plan's partition count
    # would match), different content — must append, not skip
    write_jsonl(src, 100, 200)
    assert main(["encode", "--input", str(src), "--output", cont,
                 "--input-format", "jsonl", "--group-col", "source",
                 "--weight-col", "n_chars", "--sort-key", "doc_id",
                 "--target-weight", "100000", "--append"]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["container"]["n_rows"] == 200


@pytest.mark.usefixtures("ray_session")
def test_job_compact(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    cont = str(tmp_path / "cont")
    for i in range(4):
        p = tmp_path / f"d{i}.parquet"
        pq.write_table(make_tokens_table(100, seed=20 + i), p)
        assert main(["encode", "--input", str(p), "--output", cont,
                     "--target-weight", "100000", "--append",
                     "--append-id", f"inc-{i}"]) == 0
        capsys.readouterr()
    assert main(["compact", "--container", cont,
                 "--target-weight", "100000"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_groups"] >= 1 and s["n_rows"] == 400
    assert main(["verify", "--container", cont]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["n_bad"] == 0


@pytest.mark.usefixtures("ray_session")
def test_job_delete(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    p = tmp_path / "in.parquet"
    t = make_tokens_table(400, seed=30)
    pq.write_table(t, p)
    cont = str(tmp_path / "cont")
    assert main(["encode", "--input", str(p), "--output", cont,
                 "--target-weight", "50000"]) == 0
    capsys.readouterr()
    assert main(["delete", "--container", cont,
                 "--column", "n_tok", "--lo", "6000"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    import pyarrow.compute as pc
    want = sum(1 for v in t["n_tok"].to_pylist() if v >= 6000)
    assert s["n_deleted"] == want
    assert s["n_rows"] == 400 - want


@pytest.mark.usefixtures("ray_session")
def test_job_recluster(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    p = tmp_path / "in.parquet"
    t = make_tokens_table(800, seed=31)
    pq.write_table(t, p)
    cont = str(tmp_path / "cont")
    out = str(tmp_path / "clustered")
    assert main(["encode", "--input", str(p), "--output", cont,
                 "--target-weight", "50000"]) == 0
    capsys.readouterr()
    assert main(["recluster", "--container", cont, "--output", out,
                 "--key", "doc_id", "--target-weight", "50000"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_rows"] == 800
    assert s["plan"]["range_key"] == "doc_id"
    assert s["clustering"]["overlap_factor"] <= 1.25
    assert main(["verify", "--container", out]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["n_bad"] == 0


@pytest.mark.usefixtures("ray_session")
def test_job_recluster_incremental(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    cont = str(tmp_path / "cont")
    p = tmp_path / "in.parquet"
    pq.write_table(make_tokens_table(600, seed=41), p)
    # clustered base (range on n_tok), then one month-wide append
    assert main(["encode", "--input", str(p), "--output", cont,
                 "--target-weight", "40000"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "byk")
    assert main(["recluster", "--container", cont, "--output", out,
                 "--key", "n_tok", "--target-weight", "40000"]) == 0
    capsys.readouterr()
    p2 = tmp_path / "in2.parquet"
    pq.write_table(make_tokens_table(200, seed=42), p2)
    assert main(["encode", "--input", str(p2), "--output", out,
                 "--target-weight", "40000", "--append",
                 "--append-id", "i1"]) == 0
    capsys.readouterr()
    assert main(["recluster", "--container", out, "--key", "n_tok",
                 "--incremental", "--target-weight", "40000"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_rows"] == 800 and s["n_messy"] >= 1
    assert main(["verify", "--container", out]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["n_bad"] == 0


@pytest.mark.usefixtures("ray_session")
def test_job_join_and_agg(tmp_path, capsys):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(51)
    a = pa.table({"oid": [f"o{i}" for i in range(500)],
                  "uid": pa.array(rng.integers(0, 100, 500),
                                  type=pa.int64()),
                  "v": pa.array(rng.integers(1, 10, 500),
                                type=pa.int64())})
    b = pa.table({"uid": pa.array(np.arange(100), type=pa.int64()),
                  "name": [f"u{i}" for i in range(100)]})
    pq.write_table(a, tmp_path / "a.parquet")
    pq.write_table(b, tmp_path / "b.parquet")
    ca, cb = str(tmp_path / "ca"), str(tmp_path / "cb")
    for src, dst in (("a", ca), ("b", cb)):
        assert main(["encode", "--input", str(tmp_path / f"{src}.parquet"),
                     "--output", dst, "--group-col", "",
                     "--weight-col", "", "--sort-key", "uid"]) == 0
        capsys.readouterr()
    out = str(tmp_path / "joined")
    assert main(["join", "--left", ca, "--right", cb, "--key", "uid",
                 "--output", out]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows"] == 500  # every uid matches exactly one name
    assert main(["agg", "--container", ca, "--key", "uid",
                 "--agg", "v:sum", "--agg", "v:mean"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["groups"] == len(set(a["uid"].to_pylist()))
    want = sum(a["v"].to_pylist()[i] for i in range(500)
               if a["uid"].to_pylist()[i] == s["rows"][0]["uid"])
    assert s["rows"][0]["v_sum"] == want


@pytest.mark.usefixtures("ray_session")
def test_job_history_changes_rollback_sweep(tmp_path, capsys):
    from parquet2_ray.sources.tokens import make_tokens_table

    def _out():
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    base = tmp_path / "base.parquet"
    inc = tmp_path / "inc.parquet"
    pq.write_table(make_tokens_table(400, seed=4), base)
    pq.write_table(make_tokens_table(150, seed=5), inc)
    cont = str(tmp_path / "cont")
    assert main(["encode", "--input", str(base), "--output", cont,
                 "--target-weight", "60000"]) == 0
    capsys.readouterr()
    assert main(["encode", "--append", "--input", str(inc),
                 "--output", cont, "--target-weight", "60000"]) == 0
    capsys.readouterr()

    assert main(["history", "--container", cont]) == 0
    h = _out()["history"]
    assert [(e["txn"], e["op"]) for e in h] == [(0, "encode"),
                                                (1, "append")]
    assert "part_ids" not in h[0]   # default output stays terse

    chg = str(tmp_path / "chg")
    assert main(["changes", "--container", cont, "--since", "0",
                 "--output", chg]) == 0
    assert _out()["rows"] == 150
    assert pq.read_table(chg).num_rows == 150

    assert main(["rollback", "--container", cont, "--to-txn", "0"]) == 0
    assert _out()["n_rows"] == 400
    assert main(["history", "--container", cont, "--verbose"]) == 0
    h = _out()["history"]
    assert len(h) == 1 and h[0]["part_ids"]

    assert main(["sweep", "--container", cont]) == 0
    assert _out()["swept"] == 0   # rollback already swept

    assert main(["tag", "--container", cont, "--name", "v1"]) == 0
    assert _out()["txn"] == 0
    assert main(["tag", "--container", cont]) == 0
    assert _out()["tags"] == {"v1": 0}
    assert main(["tag", "--container", cont, "--delete", "v1"]) == 0
    assert _out()["deleted"] == "v1"


@pytest.mark.usefixtures("ray_session")
def test_job_ingest_cycle(tmp_path, capsys):
    import pyarrow as pa

    def _out():
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    d1 = tmp_path / "d1.parquet"
    d2 = tmp_path / "d2.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([f"a{i}" for i in range(30)]),
        "text": pa.array([f"text {i}" for i in range(30)])}), d1)
    pq.write_table(pa.table({
        "doc_id": pa.array([f"b{i}" for i in range(10)] + ["b_old"]),
        "text": pa.array([f"new {i}" for i in range(10)] + ["text 7"])}),
        d2)
    cont, idx = str(tmp_path / "cont"), str(tmp_path / "idx")
    assert main(["ingest", "--input", str(d1), "--container", cont,
                 "--index", idx, "--target-weight", "50000"]) == 0
    assert _out()["ingested"] == 30
    assert main(["ingest", "--input", str(d2), "--container", cont,
                 "--index", idx, "--target-weight", "50000"]) == 0
    r = _out()
    assert (r["ingested"], r["dropped"]) == (10, 1)
    assert main(["history", "--container", cont]) == 0
    h = _out()["history"]
    assert [(e["txn"], e["op"]) for e in h] == [(1, "append"),
                                                (2, "append")]


@pytest.mark.usefixtures("ray_session")
def test_job_upsert(tmp_path, capsys):
    import pyarrow as pa

    def _out():
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    base = tmp_path / "base.parquet"
    inc = tmp_path / "inc.parquet"
    pq.write_table(pa.table({"k": pa.array(range(100), pa.int64()),
                             "v": [f"old-{i}" for i in range(100)]}), base)
    pq.write_table(pa.table({"k": pa.array([3, 777], pa.int64()),
                             "v": ["new-3", "new-777"]}), inc)
    cont = str(tmp_path / "cont")
    assert main(["encode", "--input", str(base), "--output", cont,
                 "--sort-key", "k", "--target-weight", "50000"]) == 0
    capsys.readouterr()
    assert main(["upsert", "--input", str(inc), "--container", cont,
                 "--key", "k", "--target-weight", "50000"]) == 0
    r = _out()
    assert (r["matched"], r["inserted"]) == (1, 2)
    assert r["n_rows"] == 101


@pytest.mark.usefixtures("ray_session")
def test_job_scan_predicate_pruned(tmp_path, capsys):
    """`job.py scan`: page-index-pruned foreign-parquet scan with
    range predicates, projection, and parquet output."""
    import numpy as np
    import pyarrow as pa

    n = 5000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array((np.arange(n) % 97).astype(np.int32)),
        "s": pa.array([f"s{i:05d}" for i in range(n)]),
    })
    src = tmp_path / "scan.parquet"
    pq.write_table(t, str(src), write_page_index=True,
                   data_page_size=1024, row_group_size=2000)
    assert main(["scan", "--input", str(src),
                 "--where", "id:1000:1200"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] == 201
    out = str(tmp_path / "scanout")
    assert main(["scan", "--input", str(src), "--columns", "id,s",
                 "--where", "id:10:20", "--output", out]) == 0
    capsys.readouterr()
    got = pq.read_table(out)
    assert sorted(got["id"].to_pylist()) == list(range(10, 21))
    assert got.column_names == ["id", "s"]


@pytest.mark.usefixtures("ray_session")
def test_job_dedup_semantic(tmp_path, capsys):
    """`job.py dedup --semantic`: SemDeDup over an embedding column."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(50)
    a = rng.normal(size=12) * 8
    m = np.stack([a, a + 0.01, a - 0.01,
                  rng.normal(size=12) * 8,
                  rng.normal(size=12) * 8]).astype(np.float32)
    src = tmp_path / "emb.parquet"
    pq.write_table(pa.table({
        "vec_id": pa.array(range(5), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32())),
    }), str(src))
    out = str(tmp_path / "kept")
    assert main(["dedup", "--input", str(src), "--output", out,
                 "--semantic", "--id-col", "vec_id",
                 "--sem-threshold", "0.99", "--sem-clusters", "3"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] == 3
    assert sorted(pq.read_table(out)["vec_id"].to_pylist()) == [0, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_job_dedup_lines(tmp_path, capsys):
    import pyarrow as pa

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["shared line\nunique a",
                          "shared line\nunique b"]),
    }), str(src))
    out = str(tmp_path / "lined")
    assert main(["dedup", "--input", str(src), "--output", out,
                 "--lines"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] == 2
    got = {x["doc_id"]: x["text"]
           for x in pq.read_table(out).to_pylist()}
    assert got[0] == "shared line\nunique a"
    assert got[1] == "unique b"
