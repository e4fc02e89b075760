"""Versioned schema registry: the reference's schema-drift engine.

Reference semantics (utilities/utilities.py:140-144, 672-694): each
distinct key-set observed in incoming records becomes a numbered
schema version; version "0" is the empty sentinel; records are routed
to per-version files. The reference assigns numbers serially in
arrival order — meaningless under Spark parallelism — so this registry
makes assignment deterministic: within one ingest batch, NEW key-sets
are numbered in canonical order (sorted tuple of column names),
independent of partitioning. Re-running the same batch yields the
same versions.

Scale: version assignment never shuffles the data. The distinct
key-sets (a handful, regardless of row count) are reduced via
``distinct()`` on a derived key column, collected (tiny), registered
on the driver, and mapped back onto rows with a literal map — the
data itself stays put.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator — cannot appear in a column name


class SchemaRegistry:
    def __init__(self, versions: dict[int, tuple[str, ...]] | None = None):
        # version 0 is the empty sentinel (reference: utilities/utilities.py:140-144)
        self.versions: dict[int, tuple[str, ...]] = {0: ()}
        if versions:
            for v, cols in versions.items():
                self.versions[int(v)] = tuple(cols)

    # -- driver-side ----------------------------------------------------
    def assign_version(self, keyset) -> int:
        """Look up (or register) one key-set; returns its version."""
        key = tuple(sorted(keyset))
        for v, cols in self.versions.items():
            if tuple(sorted(cols)) == key:
                return v
        new_v = max(self.versions) + 1
        self.versions[new_v] = key
        return new_v

    def register_batch(self, keysets) -> dict[tuple[str, ...], int]:
        """Register many key-sets deterministically: new ones are
        numbered in canonical (sorted) order regardless of input order."""
        canon = sorted({tuple(sorted(ks)) for ks in keysets})
        return {ks: self.assign_version(ks) for ks in canon}

    def all_columns(self) -> list[str]:
        """Union of every version's columns (reference:
        utilities/utilities.py:306-315), sorted for deterministic
        projection (reference: utilities/utilities.py:418-419)."""
        cols: set[str] = set()
        for c in self.versions.values():
            cols.update(c)
        return sorted(cols)

    # -- persistence (schemas.json shape, FIXTURES.md F4) ----------------
    def to_json(self) -> str:
        return json.dumps({str(v): list(cols) for v, cols in sorted(self.versions.items())})

    @classmethod
    def from_json(cls, s: str) -> "SchemaRegistry":
        raw = json.loads(s)
        return cls({int(v): tuple(cols) for v, cols in raw.items()})

    # -- distributed tagging --------------------------------------------
    def tag_versions(self, df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
        """Add ``_schema_version`` to ``df``: a record's key-set is the
        set of its non-null columns (JSON-lines semantics: an absent
        key arrives as null). Only the distinct key-sets are collected
        (tiny), assigned on the driver, and mapped back via a literal
        map over a canonical key string — no shuffle of the data.
        """
        cols = key_cols or df.columns
        # canonical key string per row: sorted names of non-null columns
        key_expr = F.concat_ws(
            _SEP,
            F.array_sort(
                F.filter(
                    F.array(*[
                        F.when(F.col(c).isNotNull(), F.lit(c)) for c in cols
                    ]),
                    lambda x: x.isNotNull(),
                )
            ),
        )
        tagged = df.withColumn("_schema_key", key_expr)
        distinct_keys = [r[0] for r in tagged.select("_schema_key").distinct().collect()]
        keysets = [tuple(k.split(_SEP)) if k else () for k in distinct_keys]
        mapping = self.register_batch(keysets)
        pairs = [(_SEP.join(ks), v) for ks, v in mapping.items()]
        if not pairs:  # empty input frame: nothing to register
            return (tagged.withColumn("_schema_version", F.lit(None).cast("int"))
                    .drop("_schema_key"))
        mapping_expr = F.create_map(*[F.lit(x) for kv in pairs for x in kv])
        return (
            tagged.withColumn("_schema_version", mapping_expr[F.col("_schema_key")])
            .drop("_schema_key")
        )
