"""Reference type system -> Spark type mapping (SURVEY.md §1.2).

The reference's `logical_type` enum (`components/types/types.hpp:73-120`)
maps onto Spark types as below. Types with no Spark equivalent get the
documented promotion policy:

  - unsigned ints (UTINYINT..UBIGINT): promote to the next wider signed type;
    UBIGINT (2^64-1 max) promotes to DECIMAL(20,0) to preserve the range.
  - HUGEINT / UHUGEINT (int128): DECIMAL(38,0) — full TPC-style range, exact.
  - TIME / TIME_TZ: LongType micros-since-midnight (Spark has no time-of-day
    type); helpers below convert to/from display strings.
  - ENUM: StringType (+ an optional dictionary table if the catalog needs
    ordinal order).
  - UNION / VARIANT: VariantType on Spark 4 when parsing JSON; for typed
    columns the DynamicTable widening + variant_select path (sources/
    dynamic.py) implements the `::?` contract.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

# logical_type name (reference) -> Spark DataType (or factory description)
LOGICAL_TO_SPARK: dict[str, T.DataType | str] = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "UTINYINT": T.ShortType(),          # promotion: next signed size
    "USMALLINT": T.IntegerType(),
    "UINTEGER": T.LongType(),
    "UBIGINT": T.DecimalType(20, 0),    # 2^64-1 exceeds LongType
    "HUGEINT": T.DecimalType(38, 0),
    "UHUGEINT": T.DecimalType(38, 0),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DECIMAL": "DecimalType(w<=38, s)",
    "DATE": T.DateType(),
    "TIME": T.LongType(),               # micros since midnight
    "TIME_TZ": T.LongType(),
    "TIMESTAMP": T.TimestampNTZType(),
    "TIMESTAMP_TZ": T.TimestampType(),
    "INTERVAL": T.DayTimeIntervalType(),
    "STRING": T.StringType(),
    "BLOB": T.BinaryType(),
    "BIT": T.BinaryType(),
    "UUID": T.StringType(),
    "ENUM": T.StringType(),
    "STRUCT": "StructType(fields)",
    "LIST": "ArrayType(elem)",
    "ARRAY": "ArrayType(elem)  # fixed size enforced by CHECK",
    "MAP": "MapType(k, v)",
    "UNION": "VariantType / widen+variant_select",
    "VARIANT": "VariantType / widen+variant_select",
}


def time_to_micros(col: Column) -> Column:
    """'HH:MM:SS[.ffffff]' string -> micros since midnight (TIME storage)."""
    parts = F.split(col, ":")
    secs = F.split(parts[2], r"\.")
    micros = F.when(
        F.size(F.split(parts[2], r"\.")) > 1,
        F.rpad(secs[1], 6, "0").cast("long"),
    ).otherwise(F.lit(0))
    return (
        parts[0].cast("long") * 3_600_000_000
        + parts[1].cast("long") * 60_000_000
        + secs[0].cast("long") * 1_000_000
        + micros
    )


def micros_to_time(col: Column) -> Column:
    """micros since midnight -> 'HH:MM:SS.ffffff' display string."""
    h = F.floor(col / 3_600_000_000).cast("long")
    m = F.floor((col % 3_600_000_000) / 60_000_000).cast("long")
    s = F.floor((col % 60_000_000) / 1_000_000).cast("long")
    us = (col % 1_000_000).cast("long")
    return F.concat(
        F.lpad(h.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(s.cast("string"), 2, "0"), F.lit("."),
        F.lpad(us.cast("string"), 6, "0"),
    )


def ubigint_lit(value: int) -> Column:
    """Literal for an unsigned-64 value under the promotion policy."""
    if value < 0 or value >= 2**64:
        raise ValueError("out of UBIGINT range")
    return F.lit(str(value)).cast(T.DecimalType(20, 0))


def hugeint_lit(value: int) -> Column:
    """Literal for an int128 value under the promotion policy."""
    if abs(value) >= 10**38:
        raise ValueError("exceeds DECIMAL(38,0)")
    return F.lit(str(value)).cast(T.DecimalType(38, 0))
