"""Parquet textual "message" schema DSL (sources/message_schema.py) —
the reference's io_message parser re-expressed over Arrow schemas
(from_message.rs:290-618; its test battery is the model here)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from parquet2_ray.sources.message_schema import (
    MessageError,
    format_message,
    parse_message,
)


def test_flat_primitives_all_physical_types():
    s = parse_message("""
      message m {
        required boolean b;
        required int32 i;
        optional int64 j;
        required int96 legacy_ts;
        optional float f;
        required double d;
        optional byte_array raw;
        required binary raw2;
        optional fixed_len_byte_array(5) f5;
      }
    """)
    assert s.field("b").type == pa.bool_() and not s.field("b").nullable
    assert s.field("i").type == pa.int32()
    assert s.field("j").type == pa.int64() and s.field("j").nullable
    assert s.field("legacy_ts").type == pa.timestamp("ns")
    assert s.field("f").type == pa.float32()
    assert s.field("d").type == pa.float64()
    assert s.field("raw").type == pa.binary()
    assert s.field("raw2").type == pa.binary()
    assert s.field("f5").type == pa.binary(5)
    assert (s.metadata or {})[b"message_name"] == b"m"


def test_converted_and_logical_annotations():
    s = parse_message("""
      message m {
        optional byte_array a (UTF8);
        required byte_array a2 (STRING);
        optional byte_array j (JSON);
        required byte_array bs (BSON);
        required int32 d (DATE);
        optional int32 t_ms (TIME_MILLIS);
        required int64 t_us (TIME_MICROS);
        optional int64 ts_ms (TIMESTAMP_MILLIS);
        required int64 ts_utc (TIMESTAMP(MICROS,true));
        optional int64 ts_local (TIMESTAMP(NANOS,false));
        required int32 i8 (INT_8);
        optional int32 u16 (UINT_16);
        required int64 u64 (UINT_64);
        optional int32 w8 (INTEGER(8,true));
        required int32 wu32 (INTEGER(32,false));
        optional fixed_len_byte_array(16) u (UUID);
      }
    """)
    tp = {f.name: f.type for f in s}
    assert tp["a"] == pa.string() and tp["a2"] == pa.string()
    assert tp["j"] == pa.string() and tp["bs"] == pa.binary()
    assert tp["d"] == pa.date32()
    assert tp["t_ms"] == pa.time32("ms") and tp["t_us"] == pa.time64("us")
    assert tp["ts_ms"] == pa.timestamp("ms")
    assert tp["ts_utc"] == pa.timestamp("us", tz="UTC")
    assert tp["ts_local"] == pa.timestamp("ns")
    assert tp["i8"] == pa.int8() and tp["u16"] == pa.uint16()
    assert tp["u64"] == pa.uint64()
    assert tp["w8"] == pa.int8() and tp["wu32"] == pa.uint32()
    assert tp["u"] == pa.binary(16)


def test_decimal_physical_capacity_rules():
    # mirrors from_message.rs test_parse_message_type_decimal semantics
    ok = parse_message("""
      message m {
        required int32 a (DECIMAL(9,2));
        required int64 b (DECIMAL(18));
        required fixed_len_byte_array(5) c (DECIMAL(11,3));
        required byte_array d (DECIMAL(38,10));
      }
    """)
    assert ok.field("a").type == pa.decimal128(9, 2)
    assert ok.field("b").type == pa.decimal128(18, 0)  # scale defaults 0
    assert ok.field("c").type == pa.decimal128(11, 3)
    assert ok.field("d").type == pa.decimal128(38, 10)
    for bad in (
        "message m { required int32 a (DECIMAL(10,2)); }",   # > 9
        "message m { required int64 a (DECIMAL(19,2)); }",   # > 18
        # FLBA(5) holds ≤ 11 digits (2^39 - 1)
        "message m { required fixed_len_byte_array(5) a (DECIMAL(12)); }",
        "message m { required int32 a (DECIMAL(0)); }",      # p must be > 0
        "message m { required int32 a (DECIMAL(5,7)); }",    # s > p
        "message m { required double a (DECIMAL(5)); }",     # wrong physical
    ):
        with pytest.raises(MessageError):
            parse_message(bad)


def test_groups_lists_maps():
    s = parse_message("""
      message spark_schema {
        required group user {
          required int64 id = 1;
          optional byte_array name (UTF8);
        }
        optional group tags (LIST) {
          repeated group list {
            required int32 element;
          }
        }
        optional group props (MAP) {
          repeated group key_value {
            required byte_array key (UTF8);
            optional int64 value;
          }
        }
        repeated int32 scores;
      }
    """)
    u = s.field("user")
    assert pa.types.is_struct(u.type) and not u.nullable
    assert u.type.field("id").type == pa.int64()
    assert u.type.field("id").metadata[b"PARQUET:field_id"] == b"1"
    tags = s.field("tags")
    assert tags.type == pa.list_(pa.field("element", pa.int32(),
                                          nullable=False))
    props = s.field("props").type
    assert pa.types.is_map(props)
    assert props.key_type == pa.string()
    assert props.item_type == pa.int64() and props.item_field.nullable
    scores = s.field("scores")
    assert pa.types.is_list(scores.type) and not scores.nullable
    assert scores.type.value_type == pa.int32()
    assert not scores.type.value_field.nullable


def test_legacy_two_level_list():
    s = parse_message("""
      message m {
        optional group xs (LIST) {
          repeated int64 element;
        }
      }
    """)
    assert s.field("xs").type == pa.list_(
        pa.field("element", pa.int64(), nullable=False))


def test_invalid_inputs_raise():
    for bad in (
        "",                                            # empty
        "struct m { required int32 a; }",              # not 'message'
        "message m { required int32 a }",              # missing ';'
        "message m { required int32 a; ",              # missing '}'
        "message m { sometimes int32 a; }",            # bad repetition
        "message m { required varchar a; }",           # bad physical
        "message m { required fixed_len_byte_array a; }",  # missing (n)
        "message m { required int32 a (BANANA); }",    # bad annotation
        "message m { required int64 a (INTEGER(64)); }",   # sign required
        "message m { required int32 a (TIME(MICROS,false)); }",  # unit/phys
        "message m { required int32 a; } extra",       # trailing tokens
    ):
        with pytest.raises(MessageError):
            parse_message(bad)


def test_format_roundtrip_zoo():
    zoo = pa.schema([
        pa.field("id", pa.int64(), nullable=False,
                 metadata={b"PARQUET:field_id": b"7"}),
        pa.field("name", pa.string()),
        pa.field("flags", pa.bool_(), nullable=False),
        pa.field("score", pa.float64()),
        pa.field("small", pa.int16()),
        pa.field("uns", pa.uint32()),
        pa.field("day", pa.date32()),
        pa.field("t", pa.time64("us")),
        pa.field("ts", pa.timestamp("us", tz="UTC")),
        pa.field("ts2", pa.timestamp("ms")),
        pa.field("price", pa.decimal128(12, 4)),
        pa.field("big_price", pa.decimal128(30, 6)),
        pa.field("blob", pa.binary()),
        pa.field("fb", pa.binary(9)),
        pa.field("xs", pa.list_(pa.field("element", pa.int32(),
                                         nullable=False))),
        pa.field("nested", pa.struct([
            pa.field("a", pa.string()),
            pa.field("b", pa.list_(pa.field("element", pa.float32()))),
        ]), nullable=False),
        pa.field("kv", pa.map_(pa.string(),
                               pa.field("value", pa.int64()))),
    ])
    text = format_message(zoo, name="zoo")
    back = parse_message(text)
    assert back.equals(zoo, check_metadata=False)
    # field ids survive the roundtrip
    assert back.field("id").metadata[b"PARQUET:field_id"] == b"7"
    # and the printed form reparses to the same text (fixpoint)
    assert format_message(back, name="zoo") == text


def test_tools_schema_subcommand(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.sources.tokens import make_tokens_table
    from parquet2_ray.tools import schema

    tbl = make_tokens_table(500, seed=11)
    pq.write_table(tbl, tmp_path / "in.parquet")
    out = str(tmp_path / "cont")
    encode_dataset(str(tmp_path / "in.parquet"), out,
                   EncodeOptions(target_weight=200_000, sort_key="doc_id"))
    text = schema(out)
    assert text.startswith("message dataset {")
    back = parse_message(text)
    assert set(back.names) == set(tbl.schema.names)
    # container columns are type-faithful modulo nullability (the
    # footer records arrow types, not nullability)
    for name in tbl.schema.names:
        assert back.field(name).type == tbl.schema.field(name).type


def test_format_rejects_inexpressible_time_unit():
    # parquet TIME(INT32) is millis-only: time32('s') must raise, not
    # silently render as TIME(MILLIS) (a unit reinterpretation)
    with pytest.raises(MessageError):
        format_message(pa.schema([pa.field("t", pa.time32("s"))]))
