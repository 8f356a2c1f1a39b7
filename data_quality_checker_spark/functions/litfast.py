"""Single-call literal Column builders.

``F.array(*[F.lit(x) for x in xs])`` costs one py4j round-trip per
element — ~0.2-0.5 ms each — so a few hundred literals add SECONDS of
driver-side build time to every query that constructs the expression
(measured on the round-7 rule battery: the 138-token membership map
alone billed multi-second build cost to each small query). Rendering
the same literal as ONE SQL expression string and parsing it with a
single ``F.expr`` call is milliseconds and yields the identical
foldable expression tree.

Only for literals: strings are escaped for Spark's SQL single-quoted
literal syntax (backslash + quote), numerics rendered exactly
(float via repr round-trip, long with an L suffix).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["sql_str", "lit_str_array", "lit_double_array",
           "lit_long_array", "lit_str_map"]


def sql_str(s: str) -> str:
    """Escape ``s`` as a Spark SQL single-quoted string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def lit_str_array(xs: Iterable[str]) -> Column:
    return F.expr("array(" + ",".join(sql_str(x) for x in xs) + ")")


def lit_double_array(xs: Iterable[float]) -> Column:
    # repr() round-trips doubles exactly; 'D' suffix pins DoubleType
    return F.expr(
        "array(" + ",".join(repr(float(x)) + "D" for x in xs) + ")"
    )


def lit_long_array(xs: Iterable[int]) -> Column:
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in xs) + ")")


def lit_str_map(keys: Sequence[str], vals: Sequence[str]) -> Column:
    parts: list[str] = []
    for k, v in zip(keys, vals):
        parts.append(sql_str(k))
        parts.append(sql_str(v))
    return F.expr("map(" + ",".join(parts) + ")")
