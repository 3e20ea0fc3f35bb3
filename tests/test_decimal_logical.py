"""Decimal128 codec + logical-type invariant checks.

Mirrors the reference's spec validation
(/root/reference/src/schema/types/spec.rs:73,129 and
parquet_bridge.rs:483-501) and its fixed-len/decimal deserialize paths.
"""

import decimal

import numpy as np
import pyarrow as pa
import pytest

from parquet2_ray.codecs.column import decode_array, encode_array
from parquet2_ray.codecs.logical import check_decimal, check_logical
from parquet2_ray.functions.selector import select_codec

D = decimal.Decimal


def _rt(arr):
    return decode_array(encode_array("x", arr, select_codec(arr)))


def test_decimal_int64_fast_path():
    a = pa.array([D("123.45"), D("-0.01"), D("99999999.99"), None],
                 type=pa.decimal128(12, 2))
    col = encode_array("x", a, "decimal")
    assert col.meta.get("dec_sub")  # scaled-int64 sub-codec engaged
    assert decode_array(col).equals(a)


def test_decimal_raw_mode_beyond_int64():
    big = pa.array([D("12345678901234567890123456.78"), D("-1"), None],
                   type=pa.decimal128(38, 2))
    col = encode_array("x", big, "decimal")
    assert "dec_sub" not in col.meta
    assert decode_array(col).equals(big)


def test_decimal_edge_shapes():
    for a in (
        pa.array([], type=pa.decimal128(5, 2)),
        pa.array([None, None], type=pa.decimal128(5, 2)),
        pa.array([D("0.00")], type=pa.decimal128(1, 0)),
        pa.array([D(f"{i}.{i % 100:02d}") for i in range(1000)],
                 type=pa.decimal128(20, 2)),
    ):
        assert _rt(a).equals(a)


def test_decimal_compresses_repeated_prices():
    vals = pa.array([D("19.99"), D("5.00"), D("7.50")] * 20000,
                    type=pa.decimal128(12, 2))
    col = encode_array("p", vals, "decimal")
    assert len(col.payload) < 60000 * 16 // 20  # ≥20× vs raw slots
    assert decode_array(col).equals(vals)


def test_decimal_invariants():
    check_decimal(38, 38)
    check_decimal(1, 0)
    for p, s in ((0, 0), (39, 0), (5, 6), (5, -1)):
        with pytest.raises(ValueError):
            check_decimal(p, s)


def test_logical_annotations_roundtrip():
    u = pa.array([b"0123456789abcdef", None], type=pa.binary(16))
    col = encode_array("u", u, "plain_flba", logical="uuid")
    assert col.meta["logical"] == "uuid"
    assert decode_array(col).equals(u)

    j = pa.array(['{"a":1}', "[]"])
    col = encode_array("j", j, "dict_binary", logical="json")
    assert col.meta["logical"] == "json"
    assert decode_array(col).equals(j)


def test_logical_invariant_violations():
    with pytest.raises(ValueError):
        check_logical("uuid", pa.string())
    with pytest.raises(ValueError):
        check_logical("uuid", pa.binary(12))
    with pytest.raises(ValueError):
        check_logical("json", pa.int64())
    with pytest.raises(ValueError):
        check_logical("decimal", pa.float64())
    with pytest.raises(ValueError):
        check_logical("nope", pa.string())
    with pytest.raises(ValueError):
        encode_array("u", pa.array(["x"]), "plain_byte_array", logical="uuid")


def test_decimal_type_grammar():
    from parquet2_ray.codecs.column import str_to_type, type_to_str

    t = pa.decimal128(18, 3)
    assert str_to_type(type_to_str(t)) == t
