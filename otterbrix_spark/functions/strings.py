"""String functions with the reference's semantics.

The reference registers substring / length / regexp_replace kernels where
`length` is **byte** length (reference `components/compute/kernels/
string_functions.cpp:179-253`) and lowers SQL LIKE to a regex compare at
parse time (`components/sql/transformer/impl/transfrom_common.cpp:352-379`).
Spark equivalents are all built-in; `blength` pins the byte semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def blength(col: Column) -> Column:
    """Byte length of a UTF-8 string (reference `length` semantics)."""
    return F.octet_length(col)


def char_length(col: Column) -> Column:
    return F.length(col)


def like_to_regex(pattern: str) -> str:
    """SQL LIKE pattern -> anchored regex, mirroring the reference's
    parse-time lowering (``%`` -> ``.*``, ``_`` -> ``.``)."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"
