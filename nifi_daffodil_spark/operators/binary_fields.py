"""Schema-driven fixed-width binary field extraction.

Reference: the second DFDL schema family parses length-prefixed BINARY
payloads with explicit bit-length unsigned-int fields and a byte order
taken from an external variable (`bitlength.dfdl.xsd:26-43`,
`byteOrder="{ $dfdl:byteOrder }"` at :27; the byte-order-flip test pair
noleftover.bin.xml 57297 vs noleftover_le.bin.xml 53727,
TestDaffodilProcessor.java byte-order family).

Engine mapping: a declared field list (name, nibble offset, nibble length)
compiled into pure Catalyst expressions — `hex()` the binary payload once,
then each field is a positional slice decoded with nibble arithmetic
(`instr('0123456789abcdef', c) - 1`), an expression family that evaluates
identically in Spark SQL and DuckDB, which is what makes the extraction
oracle-checkable. Byte order is a parameter with exactly the reference's
two values ("big" | "little"); little-endian reverses the field's bytes
before decoding. Granularity is the nibble (4 bits): offsets and lengths
are given in nibbles, so any multiple-of-4-bit field works; this covers
the reference's 12/16/32-bit test fields.

No Python in the hot path: one hex() projection + per-field arithmetic,
all whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


@dataclass(frozen=True)
class BinaryField:
    name: str
    nibble_offset: int  # 0-based, from payload start
    nibble_len: int     # field width in nibbles (4-bit units)

    def __post_init__(self) -> None:
        if self.nibble_offset < 0 or self.nibble_len <= 0:
            raise ValueError(f"bad field spec for {self.name!r}")
        if self.nibble_len > 15:
            raise ValueError(
                f"{self.name!r}: fields wider than 60 bits overflow a long"
            )


def _nibble(hex_col: Column, pos_1b: int) -> Column:
    """Value 0..15 of the 1-based nibble at pos (lowercase hex string)."""
    return F.instr(F.lit(_HEX), F.substring(hex_col, pos_1b, 1)) - F.lit(1)


def decode_field(hex_col: Column, field: BinaryField, byte_order: str = "big") -> Column:
    """Unsigned integer value of one declared field from the hex rendering.

    big:    nibbles are taken in order (most-significant first).
    little: the field's BYTES are reversed before decoding (the reference's
            $dfdl:byteOrder semantics); requires whole bytes (even nibble
            count and even offset).
    """
    if byte_order not in ("big", "little"):
        raise ValueError(f"byte_order must be big|little, got {byte_order!r}")
    start = field.nibble_offset + 1  # 1-based for substring
    positions = list(range(start, start + field.nibble_len))
    if byte_order == "little":
        if field.nibble_len % 2 or field.nibble_offset % 2:
            raise ValueError(
                f"{field.name!r}: little-endian needs whole-byte alignment"
            )
        pairs = [positions[i : i + 2] for i in range(0, len(positions), 2)]
        positions = [p for pair in reversed(pairs) for p in pair]
    # long accumulator from the start: ANSI mode overflows int32 on fields
    # wider than 7 nibbles otherwise
    out: Column = F.lit(0).cast("long")
    for p in positions:
        out = out * F.lit(16) + _nibble(hex_col, p).cast("long")
    return out


def parse_fixed_binary(
    df: DataFrame,
    fields: list[BinaryField],
    payload_col: str = "payload",
    byte_order: str = "big",
    expected_len_col: str | None = None,
) -> DataFrame:
    """Adds one long column per declared field, decoded from a BINARY column.

    Rows whose payload is shorter than the declared field extents get
    `_error='SHORT_PAYLOAD'` unconditionally: substring past end yields ''
    and instr(hex, '') is 1, so missing nibbles would otherwise silently
    decode as 0 (DaffodilParse.java parse-error analog; callers route to
    quarantine).

    `expected_len_col`: optional exactly-consumed guard — when given, rows
    whose payload byte length differs from it get `_error='LEFTOVER_DATA'`
    (DaffodilParse.java:92-98 analog); callers route them to quarantine.
    """
    hexed = F.lower(F.hex(F.col(payload_col)))
    out = df.withColumn("_hex", hexed)
    for f in fields:
        out = out.withColumn(f.name, decode_field(F.col("_hex"), f, byte_order))
    max_nibbles = max(f.nibble_offset + f.nibble_len for f in fields)
    # isNull explicitly: octet_length(NULL)*2 < n is NULL, and F.when(NULL)
    # silently passes the row as valid — the exact silent-garbage mode this
    # guard exists to close (code-review finding)
    short = F.col(payload_col).isNull() | (
        F.octet_length(F.col(payload_col)) * F.lit(2) < F.lit(max_nibbles)
    )
    if expected_len_col is not None:
        err = F.when(short, F.lit("SHORT_PAYLOAD")).when(
            F.octet_length(F.col(payload_col)) != F.col(expected_len_col),
            F.lit("LEFTOVER_DATA"),
        )
    else:
        err = F.when(short, F.lit("SHORT_PAYLOAD"))
    return out.withColumn("_error", err).drop("_hex")
