"""Logical-type invariant checks — the analog of the reference's
schema spec validation (/root/reference/src/schema/types/spec.rs:73,129
`check_decimal_invariants` / `check_converted_invariants` and the
logical-type bridge /root/reference/src/parquet_bridge.rs:483-501).

Each check raises ``ValueError`` with a message naming the violated
invariant, exactly the failure mode the reference surfaces as
``Error::oos``.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["check_decimal", "check_logical"]

MAX_DECIMAL128_PRECISION = 38


def check_decimal(precision: int, scale: int) -> None:
    """Parquet decimal invariants (spec.rs:73 `check_decimal_invariants`)."""
    if precision < 1:
        raise ValueError(f"decimal precision must be ≥ 1, got {precision}")
    if precision > MAX_DECIMAL128_PRECISION:
        raise ValueError(
            f"decimal precision {precision} exceeds decimal128 max "
            f"{MAX_DECIMAL128_PRECISION}"
        )
    if scale < 0:
        raise ValueError(f"decimal scale must be ≥ 0, got {scale}")
    if scale > precision:
        raise ValueError(
            f"decimal scale {scale} exceeds precision {precision}"
        )


def check_logical(logical: str, t: pa.DataType) -> None:
    """Validate an (annotation, physical arrow type) pairing
    (parquet_bridge.rs:483-501: UUID→FLBA[16], JSON/ENUM→byte array)."""
    if logical == "uuid":
        if not (pa.types.is_fixed_size_binary(t) and t.byte_width == 16):
            raise ValueError(
                f"uuid logical type requires fixed_size_binary[16], got {t}"
            )
    elif logical in ("json", "enum", "bson"):
        if not (
            pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)
        ):
            raise ValueError(
                f"{logical} logical type requires a byte-array column, got {t}"
            )
    elif logical == "decimal":
        if not pa.types.is_decimal(t):
            raise ValueError(f"decimal logical type requires a decimal column, got {t}")
        check_decimal(t.precision, t.scale)
    else:
        raise ValueError(f"unknown logical type annotation {logical!r}")
