"""parquet-tools analog for encoded-partition datasets (SURVEY.md S14).

Mirrors the reference CLI surface
(/root/reference/parquet-tools/src/main.rs:9-57):

    python -m parquet2_ray.tools rowcount <out_dir>
    python -m parquet2_ray.tools meta     <out_dir>
    python -m parquet2_ray.tools dump     <out_dir> [--limit N]
    python -m parquet2_ray.tools layout   <out_dir> [--columns a,b]

All subcommands are driver-side manifest/footer reads — no Ray session,
no full-data decode except ``dump`` (which decodes partition files one
at a time until ``--limit`` rows are printed).
"""

from __future__ import annotations

import argparse
import json

from .state import manifest as mf


def rowcount(out_dir: str) -> int:
    # reference: parquet-tools/src/lib/rows.rs:6-18 (sum of group rows)
    records = mf.load_manifest(out_dir)
    return sum(r["n_rows"] for r in records.values())


def meta(out_dir: str) -> dict:
    records = mf.load_manifest(out_dir)
    parts = []
    for pid in sorted(records):
        r = records[pid]
        parts.append(
            {
                "part_id": r["part_id"],
                "n_rows": r["n_rows"],
                "n_weight": r.get("n_weight"),
                "raw_bytes": r["raw_bytes"],
                "encoded_bytes": r["encoded_bytes"],
                "codecs": r.get("codecs"),
                "fingerprint": r.get("fingerprint", "")[:16],
            }
        )
    return {
        "n_partitions": len(parts),
        "n_rows": sum(p["n_rows"] for p in parts),
        "raw_bytes": sum(p["raw_bytes"] for p in parts),
        "encoded_bytes": sum(p["encoded_bytes"] for p in parts),
        "partitions": parts,
    }


def metrics(out_dir: str) -> dict:
    """Aggregate the per-partition metrics ledger (north rule: job
    throughput is 'reported from the per-partition metrics ledger').

    Sums rows/weight/bytes and per-phase core-seconds across committed
    partitions and derives aggregate throughput + compression ratio —
    the numbers a cluster-size comparison (N vs 4N) is judged on,
    computed from durable state rather than a driver stopwatch, so a
    resumed or multiply-driven job still reports correctly."""
    records = mf.load_manifest(out_dir)
    total: dict = {
        "n_partitions": len(records),
        "n_rows": 0,
        "n_weight": 0,
        "raw_bytes": 0,
        "encoded_bytes": 0,
        "encode_core_s": 0.0,
        "phase_core_s": {},
    }
    walls = []
    for r in records.values():
        total["n_rows"] += r["n_rows"]
        total["n_weight"] += r.get("n_weight") or 0
        total["raw_bytes"] += r["raw_bytes"]
        total["encoded_bytes"] += r["encoded_bytes"]
        # note: the ledger records each partition's ORIGINAL encode
        # (a resumed run returns skipped=True to its driver but never
        # rewrites the committed record), so there is no skipped count
        # here — by design the ledger describes the data, not one run
        w = float(r.get("wall_s") or 0.0)
        walls.append(w)
        total["encode_core_s"] += w
        for ph, s in (r.get("timings") or {}).items():
            total["phase_core_s"][ph] = round(
                total["phase_core_s"].get(ph, 0.0) + float(s), 4)
    total["encode_core_s"] = round(total["encode_core_s"], 4)
    total["max_partition_wall_s"] = round(max(walls), 4) if walls else 0.0
    total["compression_ratio"] = (
        round(total["raw_bytes"] / total["encoded_bytes"], 4)
        if total["encoded_bytes"] else None)
    total["weight_per_core_s"] = (
        round(total["n_weight"] / total["encode_core_s"])
        if total["encode_core_s"] else None)
    return total


def stats(out_dir: str, columns: list[str] | None = None) -> dict:
    """Statistics-only aggregates from the manifest: per-column
    count / null_count / min / max folded across every committed
    partition's lineage profiles — an O(partitions) driver read with
    ZERO data decoded.  The aggregate-pushdown analog of answering
    ``SELECT count(*), min(c), max(c)`` from row-group statistics:
    at 100 TB these are manifest-record reads, not a scan.  ``sum`` is
    only available for the container's weight column (``n_weight`` is
    part of each lineage record); other sums need a real decode."""
    from .functions.stats import fold_profiles

    records = mf.load_manifest(out_dir)
    by_col: dict[str, list] = {}
    for r in records.values():
        for p in r.get("profiles", []):
            if columns is None or p["column"] in columns:
                by_col.setdefault(p["column"], []).append(p)
    folded = {c: fold_profiles(ps) for c, ps in sorted(by_col.items())}
    return {
        "n_partitions": len(records),
        "n_rows": int(sum(r["n_rows"] for r in records.values())),
        "weight_sum": int(sum(r.get("n_weight") or 0
                              for r in records.values())),
        "columns": folded,
    }


def layout(out_dir: str, columns: list[str] | None = None) -> dict:
    """Clustering-quality report from the manifest alone (no data read):
    per-column overlap factor — the average number of partitions a
    random point/range probe on that column must touch (1.0 = perfectly
    range-clustered, ≈ n_partitions = unclustered).  The ``OPTIMIZE``-
    advisor read: a hot filter column with a high factor is a
    ``recluster`` candidate."""
    from .pipelines.recluster_pipeline import clustering_quality

    records = mf.load_manifest(out_dir)
    if columns is None:
        cols = sorted({p["column"] for r in records.values()
                       for p in r.get("profiles", [])
                       if p.get("min") is not None})
    else:
        cols = columns
    return {
        "n_partitions": len(records),
        # one manifest read for the whole report, not one per column
        "columns": {c: clustering_quality(out_dir, c, records=records)
                    for c in cols},
    }


def schema(out_dir: str) -> str:
    """Print the dataset's schema in the parquet "message" DSL
    (reference io_message — the interchange dialect every parquet tool
    prints), reconstructed from one committed partition footer."""
    import pyarrow as pa

    from .codecs.column import str_to_type
    from .sources.message_schema import format_message

    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    first = records[min(records, key=lambda p: int(p[1:]))]
    footer = mf.read_partition_footer(first["path"])
    cols = (footer["blocks"][0]["columns"] if footer.get("paged")
            else footer["columns"])
    sch = pa.schema([pa.field(m["name"], str_to_type(m["arrow_type"]))
                     for m in cols])
    return format_message(sch, name="dataset")


def dump(out_dir: str, limit: int = 10) -> list[dict]:
    from .stages.encode import decode_partition_path

    records = mf.load_manifest(out_dir)
    rows: list[dict] = []
    for pid in sorted(records):
        if len(rows) >= limit:
            break
        tbl = decode_partition_path(records[pid]["path"])
        take = min(limit - len(rows), tbl.num_rows)
        rows.extend(tbl.slice(0, take).to_pylist())
    return rows


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="parquet2_ray.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("rowcount", "meta", "metrics", "schema", "dump", "stats",
                 "layout"):
        p = sub.add_parser(name)
        p.add_argument("out_dir")
        if name == "dump":
            p.add_argument("--limit", type=int, default=10)
        if name in ("stats", "layout"):
            p.add_argument("--columns", default=None,
                           help="comma-separated projection")
    args = ap.parse_args(argv)
    if args.cmd == "rowcount":
        print(rowcount(args.out_dir))
    elif args.cmd == "meta":
        print(json.dumps(meta(args.out_dir), indent=2, default=str))
    elif args.cmd == "metrics":
        print(json.dumps(metrics(args.out_dir), indent=2, default=str))
    elif args.cmd == "schema":
        print(schema(args.out_dir))
    elif args.cmd == "stats":
        cols = args.columns.split(",") if args.columns else None
        print(json.dumps(stats(args.out_dir, cols), indent=2, default=str))
    elif args.cmd == "layout":
        cols = args.columns.split(",") if args.columns else None
        print(json.dumps(layout(args.out_dir, cols), indent=2, default=str))
    else:
        for row in dump(args.out_dir, args.limit):
            print(json.dumps(row, default=str))


if __name__ == "__main__":
    main()
