"""Accessor layer — engine equivalent of the reference's lens module
(``/root/reference/src/Data/Schematic/Lens.hs``) and construction DSL
(``DSL.hs:21-92``).

The reference's lenses project/update fields of *typed records*
(fget/fput/flens, Lens.hs:40-89) and project records onto field subsets
(fsubset/fcast, Lens.hs:112-155). On DataFrames these are column
operations; the value here is doing them at arbitrary *nested* paths
(struct fields inside arrays of structs) without rebuilding structs by
hand, which is what ``withField``/``transform`` compose to.

Paths use the same segment grammar as migrations: object keys and
``"[]"`` for array traversal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRAVERSE = "[]"


def get_at_path(root: Column, path: tuple[str, ...]) -> Column:
    """fget analog at a nested path. Array traversal maps over elements
    (result is an array column of the projected values)."""
    if not path:
        return root
    head, rest = path[0], path[1:]
    if head == TRAVERSE:
        return F.transform(root, lambda x: get_at_path(x, rest))
    return get_at_path(root[head], rest)


def set_at_path(root: Column, path: tuple[str, ...], value) -> Column:
    """fput analog: functional update at a nested path (structs via
    withField, arrays via transform). ``value`` may be a Column or a
    function Column→Column receiving the old value."""
    if not path:
        return value(root) if callable(value) else F.lit(value) \
            if not isinstance(value, Column) else value
    head, rest = path[0], path[1:]
    if head == TRAVERSE:
        return F.transform(root, lambda x: set_at_path(x, rest, value))
    return root.withField(head, set_at_path(root[head], rest, value))


def field_lens(df: DataFrame, column: str, path: tuple[str, ...]):
    """flens analog: (getter_df, setter) pair for a nested path under a
    top-level column."""
    def getter() -> Column:
        return get_at_path(F.col(column), path)

    def setter(value) -> DataFrame:
        return df.withColumn(column, set_at_path(F.col(column), path, value))

    return getter, setter


def project_subset(df: DataFrame, *columns: str) -> DataFrame:
    """fsubset analog — column pruning (Lens.hs:112-155). Catalyst
    pushes this into the scan's ReadSchema."""
    return df.select(*columns)


def construct(schema, **field_values) -> Column:
    """DSL ``withRepr/field/construct`` analog (DSL.hs:21-92): build a
    schema-conforming struct **field-order-independently** — callers pass
    kwargs in any order; the struct lands in spec field order (the
    fcast reordering)."""
    from .schema.ast import SObject

    if not isinstance(schema, SObject):
        raise TypeError("construct targets an object schema")
    missing = [n for n in schema.field_names() if n not in field_values]
    if missing:
        raise KeyError(f"missing fields: {missing}")
    extras = sorted(set(field_values) - set(schema.field_names()))
    if extras:
        raise KeyError(
            f"unknown fields: {extras} — silently dropping them would "
            f"lose data the caller believes is serialized"
        )
    cols = []
    for name in schema.field_names():
        v = field_values[name]
        col = v if isinstance(v, Column) else F.lit(v)
        cols.append(col.alias(name))
    return F.struct(*cols)
