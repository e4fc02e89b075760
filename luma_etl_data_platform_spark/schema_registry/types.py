"""JSON-schema metadata → Spark / SQL type mapping.

Re-expresses the reference's type system (reference: metadata/types.py:
6-102 maps JSON-schema ``{type, maxLength, format, enum}`` properties
to SQL Server column types, with a per-column override for
``AsyncActionRequest.ActionParameters``; metadata/datalakemetadata.py:
34-36 fetches the ``schema.properties`` map). The Spark mapping is the
semantic one (real booleans/timestamps/decimals, not varchar), but
``sqlserver_type_for`` keeps the reference's exact emission rules so
byte-parity DDL tests remain possible.
"""

from __future__ import annotations

from pyspark.sql import types as T

# varchar length cap in the reference: above this emit MAX
# (reference: metadata/types.py:24-29).
_VARCHAR_CAP = 8000
_ENUM_WIDTH = 120   # reference: metadata/types.py:16-17
_BOOL_WIDTH = 5     # reference: metadata/types.py:38-39 — booleans stored as text

# Per-column exceptions (reference: metadata/types.py:31-33 forces a
# 1-char ActionParameters column to varchar(MAX)).
_SQL_OVERRIDES: dict[str, str] = {
    "ActionParameters": "varchar(MAX)",
}


def spark_type_for(prop: dict) -> T.DataType:
    """Map one JSON-schema property descriptor to a Spark type."""
    ptype = prop.get("type", "string")
    if ptype == "string":
        if prop.get("format") in ("date", "date-time"):
            return T.TimestampType()
        return T.StringType()
    if ptype == "boolean":
        return T.BooleanType()
    if ptype == "integer":
        return T.LongType()
    if ptype == "number":
        # Money-parity default (reference: metadata/types.py:41-43
        # emits decimal(18,2)); callers doing general math should cast
        # to double explicitly.
        return T.DecimalType(18, 2)
    raise ValueError(f"unsupported JSON-schema type {ptype!r}")


def sqlserver_type_for(name: str, prop: dict) -> str:
    """The reference's SQL Server emission rules, for DDL parity tests."""
    if name in _SQL_OVERRIDES:
        return _SQL_OVERRIDES[name]
    ptype = prop.get("type", "string")
    if ptype == "string":
        if prop.get("format") in ("date", "date-time"):
            return "datetime2"
        if "enum" in prop:
            return f"varchar({_ENUM_WIDTH})"
        max_len = prop.get("maxLength")
        if max_len is None or max_len > _VARCHAR_CAP:
            return "varchar(MAX)"
        return f"varchar({max_len})"
    if ptype == "boolean":
        return f"varchar({_BOOL_WIDTH})"
    if ptype == "integer":
        return "int"
    if ptype == "number":
        return "decimal(18,2)"
    raise ValueError(f"unsupported JSON-schema type {ptype!r}")


def struct_from_metadata(properties: dict, columns: list[str] | None = None) -> T.StructType:
    """Build a StructType from a metadata ``properties`` map, optionally
    restricted to ``columns`` (the user include-list — reference:
    utilities/utilities.py:98-107 ``resolved_columns``)."""
    names = list(properties) if columns is None else [c for c in columns if c in properties]
    return T.StructType([
        T.StructField(n, spark_type_for(properties[n]), nullable=True) for n in names
    ])


def filter_metadata(properties: dict, columns: list[str]) -> dict:
    """Intersect metadata with a desired column list (reference:
    utilities/utilities.py:261-283)."""
    return {k: v for k, v in properties.items() if k in columns}
