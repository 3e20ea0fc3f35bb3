"""Parquet textual "message" schema DSL ↔ Arrow schema.

The reference's largest file implements a parser from the classic
parquet schema string (``message m { required int64 id; optional
binary s (UTF8); ... }``) to its internal type tree
(/root/reference/src/schema/io_message/from_message.rs:290-618).  This
engine is Arrow-native, so the analog maps the SAME grammar directly
to ``pyarrow.Schema`` — the one way to declare a container schema
without constructing Arrow objects by hand — plus the inverse
(``format_message``) used by the tools CLI to print a container's
schema in the interchange dialect every parquet tool understands.

Grammar (case-insensitive keywords, names case-sensitive)::

    message <name> { <field>* }
    field   := repetition (group | primitive)
    group   := 'group' <name> [ '(' LIST|MAP|MAP_KEY_VALUE ')' ]
               [ '=' <id> ] '{' <field>* '}'
    primitive := <physical> ['(' <len> ')']   # FIXED_LEN_BYTE_ARRAY
               <name> [ '(' <annotation> ')' ] [ '=' <id> ] ';'
    repetition := required | optional | repeated

Annotations cover both the legacy converted types (UTF8, DECIMAL(p,s),
DATE, TIME_MILLIS/_MICROS, TIMESTAMP_MILLIS/_MICROS, [U]INT_8/16/32/64,
ENUM, JSON, BSON, INTERVAL) and the modern logical types (STRING,
INTEGER(w,signed), DECIMAL(p,s), DATE, TIME(unit,utc),
TIMESTAMP(unit,utc), JSON, BSON, UUID, ENUM, UNKNOWN) with the same
argument defaults and DECIMAL physical-width validation as the
reference (scale 0 when omitted; INT32 ≤ 9 digits, INT64 ≤ 18, FLBA(n)
≤ digits of 2^(8n-1)-1).

Arrow mapping notes:
- OPTIONAL → nullable field, REQUIRED → non-nullable;
- a bare REPEATED field is a one-level list (items non-null);
- group (LIST) accepts the standard 3-level shape and the legacy
  2-level shape (repeated primitive child);
- ``= N`` field ids land in field metadata ``PARQUET:field_id``,
  the key pyarrow itself uses;
- INT96 → timestamp[ns] (the import convention), UNKNOWN → null type.
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["parse_message", "format_message"]

_FIELD_ID_KEY = b"PARQUET:field_id"

_TOKEN = re.compile(r"[;{}()=,]|[^\s;{}()=,]+")

_PHYSICAL = {"BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE",
             "BYTE_ARRAY", "BINARY", "FIXED_LEN_BYTE_ARRAY"}

_UNITS = {"MILLIS": "ms", "MICROS": "us", "NANOS": "ns"}


class MessageError(ValueError):
    pass


def _max_decimal_precision_flba(n: int) -> int:
    # largest p with 10^p - 1 <= 2^(8n-1) - 1
    return len(str((1 << (8 * n - 1)) - 1)) - 1


class _Parser:
    def __init__(self, text: str):
        self.toks = _TOKEN.findall(text)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise MessageError("unexpected end of schema string")
        self.i += 1
        return self.toks[self.i - 1]

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise MessageError(f"expected {tok!r}, found {got!r}")

    def accept(self, tok: str) -> bool:
        if self.peek() == tok:
            self.i += 1
            return True
        return False

    # ---- grammar ----

    def message(self) -> pa.Schema:
        if self.next().lower() != "message":
            raise MessageError("schema must start with 'message'")
        name = self.next()
        fields = self.fields()
        if self.peek() is not None:
            raise MessageError(f"trailing tokens after schema: {self.peek()!r}")
        return pa.schema(fields, metadata={"message_name": name})

    def fields(self) -> list[pa.Field]:
        self.expect("{")
        out = []
        while not self.accept("}"):
            out.append(self.field())
        return out

    def field(self) -> pa.Field:
        rep = self.next().lower()
        if rep not in ("required", "optional", "repeated"):
            raise MessageError(f"invalid repetition {rep!r}")
        tok = self.next()
        if tok.lower() == "group":
            f = self.group()
        else:
            f = self.primitive(tok.upper())
        if rep == "repeated":
            # parquet repeated = zero-or-more of a REQUIRED element;
            # one-level Arrow list
            elem = f.with_name("element").with_nullable(False)
            return pa.field(f.name, pa.list_(elem),
                            nullable=False, metadata=f.metadata)
        return f.with_nullable(rep == "optional")

    def _field_id(self) -> dict | None:
        if self.accept("="):
            return {_FIELD_ID_KEY: self.next()}
        return None

    def group(self) -> pa.Field:
        name = self.next()
        ann = None
        if self.accept("("):
            ann = self.next().upper()
            if ann not in ("LIST", "MAP", "MAP_KEY_VALUE"):
                raise MessageError(f"invalid group annotation {ann!r}")
            self.expect(")")
        meta = self._field_id()
        children = self.fields()
        if ann == "LIST":
            return pa.field(name, self._as_list(children), metadata=meta)
        if ann in ("MAP", "MAP_KEY_VALUE"):
            return pa.field(name, self._as_map(children), metadata=meta)
        return pa.field(name, pa.struct(self._unwrap(children)),
                        metadata=meta)

    @staticmethod
    def _unwrap(children: list[pa.Field]) -> list[pa.Field]:
        return children

    @staticmethod
    def _as_list(children: list[pa.Field]) -> pa.DataType:
        if len(children) != 1:
            raise MessageError("LIST group needs exactly one child")
        mid = children[0]
        if not pa.types.is_list(mid.type):
            raise MessageError("LIST child must be repeated")
        inner = mid.type.value_field
        if pa.types.is_struct(inner.type) and inner.type.num_fields == 1:
            # standard 3-level: repeated group list { element }
            return pa.list_(inner.type.field(0))
        # legacy 2-level: repeated primitive directly
        return pa.list_(inner)

    @staticmethod
    def _as_map(children: list[pa.Field]) -> pa.DataType:
        if len(children) != 1:
            raise MessageError("MAP group needs exactly one child")
        mid = children[0]
        if not pa.types.is_list(mid.type):
            raise MessageError("MAP child must be a repeated group")
        kv = mid.type.value_field.type
        if not pa.types.is_struct(kv) or kv.num_fields != 2:
            raise MessageError("MAP key_value group needs (key, value)")
        key, val = kv.field(0), kv.field(1)
        if key.nullable:
            raise MessageError("MAP key must be required")
        return pa.map_(key.type, val)

    def primitive(self, phys: str) -> pa.Field:
        if phys not in _PHYSICAL:
            raise MessageError(f"invalid physical type {phys!r}")
        length = None
        if phys == "FIXED_LEN_BYTE_ARRAY":
            self.expect("(")
            length = self._int("FIXED_LEN_BYTE_ARRAY length")
            self.expect(")")
            if length <= 0:
                raise MessageError("FIXED_LEN_BYTE_ARRAY length must be > 0")
        name = self.next()
        ann = None
        args: tuple = ()
        if self.accept("("):
            ann = self.next().upper()
            args = self._annotation_args(ann)
            self.expect(")")
        meta = self._field_id()
        self.expect(";")
        return pa.field(name, self._arrow_type(phys, length, ann, args),
                        metadata=meta)

    def _int(self, what: str) -> int:
        tok = self.next()
        try:
            return int(tok)
        except ValueError:
            raise MessageError(f"failed to parse {what}: {tok!r}")

    def _bool(self, what: str) -> bool:
        tok = self.next().lower()
        if tok not in ("true", "false"):
            raise MessageError(f"failed to parse {what}: {tok!r}")
        return tok == "true"

    def _unit(self, what: str) -> str:
        tok = self.next().upper()
        if tok not in _UNITS:
            raise MessageError(f"invalid time unit for {what}: {tok!r}")
        return _UNITS[tok]

    def _annotation_args(self, ann: str) -> tuple:
        if ann == "DECIMAL":
            if not self.accept("("):
                return (0, 0)
            precision = self._int("DECIMAL precision")
            scale = self._int("DECIMAL scale") if self.accept(",") else 0
            self.expect(")")
            return (precision, scale)
        if ann in ("TIME", "TIMESTAMP"):
            if not self.accept("("):
                return ("ms", False)
            unit = self._unit(ann)
            utc = self._bool(f"{ann} utc flag") if self.accept(",") else False
            self.expect(")")
            return (unit, utc)
        if ann == "INTEGER":
            if not self.accept("("):
                raise MessageError("INTEGER requires width and sign")
            width = self._int("INTEGER width")
            if not self.accept(","):
                raise MessageError("INTEGER requires sign")
            signed = self._bool("INTEGER sign")
            self.expect(")")
            return (width, signed)
        return ()

    def _arrow_type(self, phys: str, length, ann, args) -> pa.DataType:
        if ann == "DECIMAL":
            p, s = args
            if p <= 0:
                raise MessageError("DECIMAL precision must be > 0")
            if not 0 <= s <= p:
                raise MessageError("DECIMAL scale must be in [0, precision]")
            cap = {"INT32": 9, "INT64": 18}.get(phys)
            if cap is None and phys == "FIXED_LEN_BYTE_ARRAY":
                cap = _max_decimal_precision_flba(length)
            elif cap is None and phys in ("BYTE_ARRAY", "BINARY"):
                cap = 38  # unbounded physical width; decimal128 limit
            if cap is None:
                raise MessageError(f"DECIMAL not allowed on {phys}")
            cap = min(cap, 38)
            if p > cap:
                raise MessageError(
                    f"DECIMAL({p}) exceeds {phys}"
                    f"{f'({length})' if length else ''} capacity {cap}")
            return pa.decimal128(p, s)
        if phys == "BOOLEAN":
            if ann:
                raise MessageError(f"{ann} not allowed on BOOLEAN")
            return pa.bool_()
        if phys in ("INT32", "INT64"):
            wide = phys == "INT64"
            if ann is None:
                return pa.int64() if wide else pa.int32()
            if ann == "INTEGER":
                width, signed = args
                if width not in (8, 16, 32, 64) or (width == 64) != wide:
                    raise MessageError(
                        f"INTEGER({width}) does not fit {phys}")
                return getattr(pa, f"int{width}" if signed
                               else f"uint{width}")()
            fixed = {
                ("INT32", "INT_8"): pa.int8(),
                ("INT32", "INT_16"): pa.int16(),
                ("INT32", "INT_32"): pa.int32(),
                ("INT32", "UINT_8"): pa.uint8(),
                ("INT32", "UINT_16"): pa.uint16(),
                ("INT32", "UINT_32"): pa.uint32(),
                ("INT32", "DATE"): pa.date32(),
                ("INT32", "TIME_MILLIS"): pa.time32("ms"),
                ("INT64", "INT_64"): pa.int64(),
                ("INT64", "UINT_64"): pa.uint64(),
                ("INT64", "TIME_MICROS"): pa.time64("us"),
                ("INT64", "TIMESTAMP_MILLIS"): pa.timestamp("ms"),
                ("INT64", "TIMESTAMP_MICROS"): pa.timestamp("us"),
            }.get((phys, ann))
            if fixed is not None:
                return fixed
            if ann == "TIME":
                unit, utc = args
                if not wide and unit == "ms":
                    return pa.time32("ms")
                if wide and unit in ("us", "ns"):
                    return pa.time64(unit)
                raise MessageError(f"TIME({unit}) does not fit {phys}")
            if ann == "TIMESTAMP" and wide:
                unit, utc = args
                return pa.timestamp(unit, tz="UTC" if utc else None)
            raise MessageError(f"{ann} not allowed on {phys}")
        if phys == "INT96":
            if ann:
                raise MessageError(f"{ann} not allowed on INT96")
            return pa.timestamp("ns")
        if phys == "FLOAT":
            return pa.float32()
        if phys == "DOUBLE":
            return pa.float64()
        if phys in ("BYTE_ARRAY", "BINARY"):
            if ann in (None, "BSON"):
                return pa.binary()
            if ann in ("UTF8", "STRING", "ENUM", "JSON"):
                return pa.string()
            raise MessageError(f"{ann} not allowed on BYTE_ARRAY")
        # FIXED_LEN_BYTE_ARRAY
        if ann is None:
            return pa.binary(length)
        if ann == "UUID":
            if length != 16:
                raise MessageError("UUID requires FIXED_LEN_BYTE_ARRAY(16)")
            return pa.binary(16)
        if ann == "INTERVAL":
            if length != 12:
                raise MessageError(
                    "INTERVAL requires FIXED_LEN_BYTE_ARRAY(12)")
            return pa.binary(12)
        raise MessageError(f"{ann} not allowed on FIXED_LEN_BYTE_ARRAY")


def parse_message(text: str) -> pa.Schema:
    """Parse a parquet "message" schema string to a ``pyarrow.Schema``
    (root name kept in schema metadata ``message_name``)."""
    return _Parser(text).message()


# ---- inverse: Arrow schema → message string ----

def _ann_and_phys(t: pa.DataType) -> tuple[str, str | None]:
    """(physical-with-length, annotation-or-None) for one leaf type."""
    if pa.types.is_boolean(t):
        return "BOOLEAN", None
    if pa.types.is_integer(t):
        width = t.bit_width
        signed = pa.types.is_signed_integer(t)
        phys = "INT64" if width == 64 else "INT32"
        if signed and width in (32, 64):
            return phys, None
        return phys, f"INTEGER({width},{str(signed).lower()})"
    if pa.types.is_date32(t):
        return "INT32", "DATE"
    if pa.types.is_time32(t):
        # parquet TIME(INT32) is millis-only: time32('s') has no
        # lossless message form — raise rather than silently reunit
        if t.unit != "ms":
            raise MessageError(f"time32 unit {t.unit} not expressible")
        return "INT32", "TIME(MILLIS,false)"
    if pa.types.is_time64(t):
        unit = {"us": "MICROS", "ns": "NANOS"}[t.unit]
        return "INT64", f"TIME({unit},false)"
    if pa.types.is_timestamp(t):
        unit = {"ms": "MILLIS", "us": "MICROS", "ns": "NANOS"}.get(t.unit)
        if unit is None:
            raise MessageError(f"timestamp unit {t.unit} not expressible")
        utc = "true" if t.tz else "false"
        return "INT64", f"TIMESTAMP({unit},{utc})"
    if pa.types.is_float32(t):
        return "FLOAT", None
    if pa.types.is_float64(t):
        return "DOUBLE", None
    if pa.types.is_decimal(t):
        p, s = t.precision, t.scale
        # 16 bytes hold any decimal128 precision (p <= 38)
        phys = ("INT32" if p <= 9 else "INT64" if p <= 18
                else "FIXED_LEN_BYTE_ARRAY(16)")
        return phys, f"DECIMAL({p},{s})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "BYTE_ARRAY", "STRING"
    if pa.types.is_fixed_size_binary(t):
        return f"FIXED_LEN_BYTE_ARRAY({t.byte_width})", None
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BYTE_ARRAY", None
    raise MessageError(f"type {t} not expressible as a message primitive")


def _fmt_field(f: pa.Field, indent: int, lines: list[str],
               repetition: str | None = None) -> None:
    pad = "  " * indent
    rep = repetition or ("optional" if f.nullable else "required")
    fid = ""
    if f.metadata and _FIELD_ID_KEY in f.metadata:
        fid = f" = {f.metadata[_FIELD_ID_KEY].decode()}"
    t = f.type
    if pa.types.is_struct(t):
        lines.append(f"{pad}{rep} group {f.name}{fid} {{")
        for i in range(t.num_fields):
            _fmt_field(t.field(i), indent + 1, lines)
        lines.append(f"{pad}}}")
        return
    if pa.types.is_map(t):
        lines.append(f"{pad}{rep} group {f.name} (MAP){fid} {{")
        lines.append(f"{pad}  repeated group key_value {{")
        _fmt_field(pa.field("key", t.key_type, nullable=False),
                   indent + 2, lines)
        _fmt_field(t.item_field.with_name("value"), indent + 2, lines)
        lines.append(f"{pad}  }}")
        lines.append(f"{pad}}}")
        return
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lines.append(f"{pad}{rep} group {f.name} (LIST){fid} {{")
        lines.append(f"{pad}  repeated group list {{")
        _fmt_field(t.value_field.with_name("element"), indent + 2, lines)
        lines.append(f"{pad}  }}")
        lines.append(f"{pad}}}")
        return
    phys, ann = _ann_and_phys(t)
    ann_s = f" ({ann})" if ann else ""
    lines.append(f"{pad}{rep} {phys.lower()} {f.name}{ann_s}{fid};")


def format_message(schema: pa.Schema, name: str | None = None) -> str:
    """Render an Arrow schema in the parquet message DSL.  Roundtrip
    guarantee: ``parse_message(format_message(s))`` equals ``s`` for
    every schema whose types the dialect can express."""
    if name is None:
        meta = schema.metadata or {}
        name = meta.get(b"message_name", b"schema").decode()
    lines = [f"message {name} {{"]
    for f in schema:
        _fmt_field(f, 1, lines)
    lines.append("}")
    return "\n".join(lines)
