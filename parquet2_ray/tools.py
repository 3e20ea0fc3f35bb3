"""parquet-tools analog for encoded-partition datasets (SURVEY.md S14).

Mirrors the reference CLI surface
(/root/reference/parquet-tools/src/main.rs:9-57):

    python -m parquet2_ray.tools rowcount <out_dir>
    python -m parquet2_ray.tools meta     <out_dir>
    python -m parquet2_ray.tools dump     <out_dir> [--limit N]

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
    for name in ("rowcount", "meta", "dump"):
        p = sub.add_parser(name)
        p.add_argument("out_dir")
        if name == "dump":
            p.add_argument("--limit", type=int, default=10)
    args = ap.parse_args(argv)
    if args.cmd == "rowcount":
        print(rowcount(args.out_dir))
    elif args.cmd == "meta":
        print(json.dumps(meta(args.out_dir), indent=2, default=str))
    else:
        for row in dump(args.out_dir, args.limit):
            print(json.dumps(row, default=str))


if __name__ == "__main__":
    main()
