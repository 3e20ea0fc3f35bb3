"""Deterministic sampling / dataset-split operators.

A 100 TB training corpus needs train/val/test splits that are
(a) a pure function of the row key — stable under re-runs, resumable
jobs, repartitioning and added data; (b) computable row-locally with
NO shuffle; (c) reproducible by any other engine for audits.

``split_by_hash`` keys the decision on ``md5(key)`` (the repo's
engine-portable fingerprint — matches DuckDB/Spark/Postgres ``md5``):
the first 8 hex chars are compared against cumulative-fraction
thresholds AS STRINGS, so the SQL oracle is a lexicographic CASE
expression with zero numeric-conversion ambiguity.  md5 is uniform, so
split sizes converge to the requested fractions.

This is a per-row tag in a single ``map_batches`` — the splits never
shuffle; downstream consumers filter on the tag column (or write
partitioned by it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import md5_hex

__all__ = ["split_by_hash", "split_thresholds", "stratified_sample"]


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(name, upper_hex8_exclusive)] with cumulative 32-bit thresholds.

    The last split's threshold is forced to 'ffffffff'+1 territory by
    using a sentinel above any hex8 string, so rounding can't orphan
    the top of the hash range."""
    if not fractions:
        raise ValueError("need at least one split")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out: list[tuple[str, str]] = []
    acc = 0.0
    items = list(fractions.items())
    for i, (name, f) in enumerate(items):
        if f < 0:
            raise ValueError(f"negative fraction for {name!r}")
        acc += f
        if i == len(items) - 1:
            out.append((name, "g"))  # > every hex char — catches all
        else:
            out.append((name, format(min(int(acc * 2**32), 2**32 - 1), "08x")))
    return out


def split_by_hash(
    ds: rd.Dataset,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    split_col: str = "split",
) -> rd.Dataset:
    """Tag every row with its split, keyed on md5(str(key)).

    SQL twin (2-way example, threshold = first 8 hex digits of
    frac·2^32):  ``CASE WHEN substr(md5(CAST(k AS VARCHAR)),1,8) <
    '<hex8>' THEN 'train' ELSE 'val' END``.
    """
    fractions = fractions or {"train": 0.9, "val": 0.1}
    thresholds = split_thresholds(fractions)
    # cumulative thresholds are ascending by construction, so the
    # first-upper-greater-than-hash scan is one vectorized searchsorted
    # (lexicographic on fixed-width hex — same order as the SQL twin)
    uppers = np.array([u for _, u in thresholds], dtype="U8")
    names = np.array([n for n, _ in thresholds], dtype=object)

    def tag(b: pa.Table) -> pa.Table:
        keys = [str(v) for v in b[key_col].to_pylist()]  # md5 needs bytes
        h8 = np.array([h[:8] for h in md5_hex(keys)], dtype="U8")
        idx = np.searchsorted(uppers, h8, side="right")
        return b.append_column(
            split_col, pa.array(names[idx], type=pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    group_col: str = "source",
    key_col: str = "doc_id",
    n_per_group: int = 100,
) -> rd.Dataset:
    """Deterministic n-per-group sample: keep each group's n rows with
    the smallest (md5(key), key) rank — a pure function of the data, so
    re-runs, retries and repartitioning return the identical sample.

    Scale shape: each batch FIRST prunes locally to its own top-n per
    group (partial combiner — at most n·groups rows leave any batch),
    then ONE groupby on the stratification key finalizes.  SQL twin:
    ``row_number() OVER (PARTITION BY g ORDER BY md5(k), k) <= n``.
    """
    import pandas as pd

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        if "_h8" not in df.columns:
            df = df.assign(
                _h8=[h[:16] for h in md5_hex([str(v) for v in df[key_col]])])
        return (df.sort_values(["_h8", key_col])
                  .groupby(group_col, sort=False).head(n_per_group))

    return (ds.select_columns([key_col, group_col])
              .map_batches(topn, batch_format="pandas")
              .groupby(group_col)
              .map_groups(topn, batch_format="pandas")
              .drop_columns(["_h8"]))
