"""ALP float codec tests (codecs/alp.py).

Covers bit-exact roundtrips of both schemes (classic decimal-scaling
and RD cut-point coding) over every float edge the IEEE bit-compare
must preserve (-0.0, NaN payloads, ±inf, subnormals, 2^53 boundary),
column-layer integration (nulls, float32 lists), selector behavior on
price-like vs high-entropy data, and the size guarantees that justify
the codec: decimal columns must beat the previous float floor (plain /
byte_stream_split), embeddings must beat plain via RD.

The reference has no float encoding beyond PLAIN (its
BYTE_STREAM_SPLIT is declared, never implemented —
/root/reference/src/encoding/mod.rs); ALP is a north-rule
"lightweight compression" extension from the public SIGMOD 2023
technique.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet2_ray.codecs import alp
from parquet2_ray.codecs import column as col
from parquet2_ray.functions.selector import candidate_sizes, select_codec


def _bits(v: np.ndarray) -> np.ndarray:
    return v.view(np.uint64 if v.dtype == np.float64 else np.uint32)


def _rt(v: np.ndarray) -> None:
    for enc, dec in ((alp.encode, alp.decode), (alp.encode_rd, alp.decode_rd)):
        out = dec(enc(v))
        assert out.dtype == v.dtype
        assert len(out) == len(v)
        assert np.array_equal(_bits(out), _bits(v)), enc.__name__


# ------------------------------------------------------------- wire level


def test_empty_singleton_constant():
    _rt(np.empty(0, dtype=np.float64))
    _rt(np.empty(0, dtype=np.float32))
    _rt(np.array([3.14]))
    _rt(np.array([2.5], dtype=np.float32))
    _rt(np.full(1000, 147.25))
    _rt(np.full(7, -0.125, dtype=np.float32))


def test_ieee_edges_bitwise():
    # NaN with a nonstandard payload must survive bit-for-bit
    weird_nan = np.array([0x7FF8DEADBEEF0001], dtype=np.uint64).view(np.float64)
    v = np.concatenate([
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan]),
        weird_nan,
        np.array([np.finfo(np.float64).tiny, 5e-324,  # subnormal
                  float(1 << 53), float((1 << 53) + 2), 1e308, -1e308]),
    ])
    _rt(v)
    v32 = np.array([0.0, -0.0, np.inf, -np.inf, np.nan,
                    np.finfo(np.float32).tiny, 1e-45, 3.4e38],
                   dtype=np.float32)
    _rt(v32)


def test_decimals_and_trailing_zeros():
    rng = np.random.default_rng(0)
    prices = np.round(rng.uniform(1, 10_000, 20_000) * 100) / 100
    _rt(prices)
    # negative-k fold: multiples of 1e6 store their digit count only
    tz = (rng.integers(0, 100, 10_000) * 1e6).astype(np.float64)
    _rt(tz)
    assert len(alp.encode(tz)) < tz.nbytes / 6
    assert len(alp.encode(prices)) < prices.nbytes / 1.8


def test_mixed_exceptions():
    rng = np.random.default_rng(1)
    v = np.round(rng.uniform(0, 100, 5000) * 100) / 100
    idx = rng.choice(5000, 100, replace=False)
    v[idx[:50]] = rng.standard_normal(50) * 1e-7  # true reals
    v[idx[50:]] = np.nan
    _rt(v)


def test_all_exceptions_still_roundtrips():
    rng = np.random.default_rng(2)
    _rt(rng.standard_normal(3000))          # classic: everything patched
    _rt(np.full(100, np.nan))


def test_float32_paths():
    rng = np.random.default_rng(3)
    _rt((rng.integers(0, 1000, 5000) / 4).astype(np.float32))
    _rt(rng.standard_normal(5000).astype(np.float32))


@settings(deadline=None, max_examples=40)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=300))
def test_roundtrip_property_f64(vals):
    _rt(np.array(vals, dtype=np.float64))


@settings(deadline=None, max_examples=40)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=32), max_size=300))
def test_roundtrip_property_f32(vals):
    _rt(np.array(vals, dtype=np.float32))


# ------------------------------------------------------------ column layer


def test_column_roundtrip_with_nulls():
    arr = pa.array([1.25, None, 147.5, -0.75, None, 8.0])
    for codec in ("alp", "alp_rd"):
        enc = col.encode_array("x", arr, codec)
        out = col.decode_array(enc)
        assert out.equals(arr)


def test_column_rejects_non_float():
    with pytest.raises(ValueError):
        col.encode_array("x", pa.array([1, 2, 3]), "alp")


def test_list_of_float32_child_roundtrip():
    rng = np.random.default_rng(4)
    data = [rng.standard_normal(8).astype(np.float32) for _ in range(200)]
    arr = pa.array(data, type=pa.list_(pa.float32()))
    enc = col.encode_array("emb", arr, "list")
    out = col.decode_array(enc)
    assert out.equals(arr)


# --------------------------------------------------------------- selector


def test_selector_picks_alp_on_prices():
    rng = np.random.default_rng(5)
    prices = pa.array(np.round(rng.uniform(1, 10_000, 20_000) * 100) / 100)
    assert select_codec(prices) == "alp"
    assert select_codec(prices, compression="zstd:3") == "alp"


def test_selector_never_picks_classic_on_reals():
    rng = np.random.default_rng(6)
    reals = pa.array(rng.standard_normal(20_000))
    assert select_codec(reals) != "alp"
    sizes = candidate_sizes(reals)
    # RD must beat plain on IEEE reals (skewed sign+exponent left part)
    assert sizes["alp_rd"] < sizes["plain"]


def test_sizes_beat_previous_float_floor():
    rng = np.random.default_rng(7)
    prices = pa.array(np.round(rng.uniform(1, 10_000, 20_000) * 100) / 100)
    sizes = candidate_sizes(prices, compression="zstd:3")
    floor = min(sizes["plain"], sizes["byte_stream_split"])
    assert sizes["alp"] < 0.9 * floor
