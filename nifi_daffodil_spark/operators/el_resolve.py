"""Per-record attribute-expression resolution — the NiFi EL analog.

Reference: every record-scoped property is an Expression-Language template
evaluated against the record's attributes before use, e.g. the schema path
`${dfdl.schema}` (AbstractDaffodilProcessor.java:93,407-408,462:
`prop.evaluateAttributeExpressions(flowFile).getValue()`). That makes
property VALUES per-record functions of the record.

Engine mapping: `resolve_attribute_expressions` compiles an `${attr}`
template once (driver-side split) into a single Catalyst `concat` of
literals and column references — whole-stage codegen, no Python per row.
Unknown attribute names fail at compile time (the analog of EL failing the
record), null attribute values render as '' (NiFi EL's null-to-empty
coercion).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\$\{([^}]+)\}")


class UnknownAttributeError(KeyError):
    """Template references an attribute the record schema does not have."""


def compile_template(template: str, columns: list[str]) -> Column:
    """`${attr}` template -> one Catalyst concat expression.

    Validation is eager: a placeholder not present in `columns` raises
    UnknownAttributeError at plan-build time, not per record.
    """
    parts = _PLACEHOLDER.split(template)
    exprs: list[Column] = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                exprs.append(F.lit(p))
        else:
            if p not in columns:
                raise UnknownAttributeError(
                    f"template references unknown attribute {p!r}; "
                    f"record has {sorted(columns)}"
                )
            # NiFi EL renders a missing/null attribute as empty string
            exprs.append(F.coalesce(F.col(p).cast("string"), F.lit("")))
    if not exprs:
        return F.lit("")
    return exprs[0] if len(exprs) == 1 else F.concat(*exprs)


def resolve_attribute_expressions(
    df: DataFrame, template: str, out_col: str = "resolved"
) -> DataFrame:
    """Adds `out_col` = the template resolved against each record."""
    return df.withColumn(out_col, compile_template(template, df.columns))
