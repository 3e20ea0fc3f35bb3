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

__all__ = ["split_by_hash", "split_thresholds", "stratified_sample",
           "source_token_totals", "mix_sources"]


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


def source_token_totals(ds: rd.Dataset, source_col: str = "source",
                        weight_col: str = "n_tok") -> dict[str, int]:
    """{source: total tokens} — per-batch partial sums combine before
    the (sources-sized) groupby, so the exchange carries O(sources)
    rows per block, never O(rows)."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([source_col, weight_col]).group_by(source_col)
        return g.aggregate([(weight_col, "sum")]).rename_columns(
            [source_col, "_w"])

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(source_col).aggregate(Sum("_w", alias_name="_w")))
    out = {}
    for row in agg.take_all():  # O(sources) rows — driver-safe
        out[row[source_col]] = int(row["_w"])
    return out


def mix_sources(
    ds: rd.Dataset,
    budgets: dict[str, int],
    source_col: str = "source",
    weight_col: str = "n_tok",
    id_col: str = "doc_id",
    seed: int = 0,
    upsample: bool = False,
    totals: dict[str, int] | None = None,
):
    """Resample a multi-source corpus to per-source TOKEN budgets —
    the training-mixture step (e.g. "100 B web, 30 B code, 5 B
    wiki").  Returns ``(dataset, report)``.

    Two passes, one of them tiny: (1) per-source token totals via a
    partial-combine groupby (O(sources) exchange); (2) a map-only
    keep/repeat pass where each doc's fate is a pure function of
    ``md5(id, seed)`` against the source's computed rate — stable
    under re-runs, repartitioning and resume, no shuffle of the data.

    ``rate = budget / total``.  rate < 1 downsamples (keep iff
    hash-fraction < rate; expected tokens = budget, binomial jitter —
    an exact cut would need a global sort for zero gain at corpus
    scale).  rate > 1 with ``upsample=True`` repeats each doc
    ``floor(rate)`` times plus one more iff hash-fraction < frac(rate)
    (epoch-style oversampling); without ``upsample`` rates cap at 1.
    Sources absent from ``budgets`` are DROPPED (explicit mixtures
    only).  The report records {source: {total, target, rate}}.
    """
    totals = totals or source_token_totals(ds, source_col, weight_col)
    rates: dict[str, float] = {}
    for src, target in budgets.items():
        tot = totals.get(src, 0)
        if tot <= 0:
            rates[src] = 0.0
            continue
        r = target / tot
        rates[src] = r if upsample else min(1.0, r)
    report = {src: {"total": totals.get(src, 0), "target": budgets[src],
                    "rate": round(rates[src], 6)} for src in budgets}

    def resample(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        srcs = b[source_col].to_numpy(zero_copy_only=False)
        rate = np.array([rates.get(s, 0.0) for s in srcs])
        keys = [f"{seed}:{k}" for k in b[id_col].to_pylist()]
        # hash-fraction in [0,1): first 8 md5 hex chars / 2^32 — the
        # same engine-portable uniform used by split_by_hash
        frac = np.array([int(h[:8], 16) for h in md5_hex(keys)],
                        dtype=np.float64) / 2**32
        copies = np.floor(rate).astype(np.int64) + (frac < rate % 1.0)
        if not upsample:
            copies = np.minimum(copies, 1)
        if (copies <= 1).all():
            return b.filter(pa.array(copies == 1))
        idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), copies)
        return b.take(pa.array(idx))

    return ds.map_batches(resample, batch_format="pyarrow"), report
