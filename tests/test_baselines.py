"""Size-baseline parity: our encoded bytes ≤ pyarrow's PLAIN /
RLE_DICTIONARY / DELTA_BINARY_PACKED on the same table (the north
rule's "≤ reference baselines" criterion; pyarrow writes the exact
parquet format the reference implements — SURVEY.md §6)."""

from __future__ import annotations

import pytest

from parquet2_ray.codecs import encode_array
from parquet2_ray.functions.selector import select_codec
from parquet2_ray.pipelines.baselines import pyarrow_size_baselines

LEAF = {
    "doc_id": "doc_id",
    "tokens": "tokens.list.element",
    "n_tok": "n_tok",
    "source": "source",
}


@pytest.fixture(scope="module")
def sizes(tokens_table):
    baselines = pyarrow_size_baselines(tokens_table)
    ours = {}
    for name in tokens_table.column_names:
        arr = tokens_table[name].combine_chunks()
        ours[name] = len(encode_array(name, arr, select_codec(arr)).payload)
    return baselines, ours


def test_total_beats_every_baseline_variant(sizes):
    baselines, ours = sizes
    total = sum(ours.values())
    for variant, per_col in baselines.items():
        assert "__error__" not in per_col, f"{variant}: {per_col}"
        assert total <= sum(per_col.values()), (
            f"total {total} exceeds pyarrow {variant} {sum(per_col.values())}"
        )


def test_each_column_beats_best_pyarrow(sizes):
    baselines, ours = sizes
    for name, sz in ours.items():
        best = min(v[LEAF[name]] for v in baselines.values())
        # allow 5% slack per column: the auto-selector works on samples
        assert sz <= best * 1.05, f"{name}: ours {sz} vs pyarrow best {best}"
