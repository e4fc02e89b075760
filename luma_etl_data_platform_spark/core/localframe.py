"""Small driver-side frames WITHOUT the Python-RDD path.

``spark.createDataFrame(rows, schema)`` on a plain Python list builds
an RDD of pickled rows: every downstream job on that frame (and every
append it feeds) launches Python workers — ~100 ms on a warm host,
multiple SECONDS on a cold or loaded one — for data that is typically
ONE ROW of flags or a vocabulary-sized lookup table. That is the
wrong execution tier: driver-known scalars belong in the JVM plan as
literals.

``local_frame`` builds the same DataFrame as a pure JVM plan —
``range(1).select(inline(array(struct(lit...), ...)))`` — so the data
is a Catalyst LocalRelation-equivalent: no Python workers, no pickle,
whole-stage-codegen-friendly, and ~20x faster per call on a loaded
host. Used by every hot path that materializes a small driver-side
table (ledger appends, gate flag rows, iterative codebook/centroid
broadcasts).

Values must be Python scalars Spark can lift with ``F.lit`` (int,
float, bool, str, bytes, Decimal, datetime/date, flat lists of
those, None); every field is cast to the declared type, so ints feed
decimal columns and NULLs are typed. For anything bigger than a few
thousand rows keep ``spark.createDataFrame`` — a megabyte of plan
literals would stress the optimizer instead.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _schema_of(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T._parse_datatype_string(schema)


def local_frame(spark: SparkSession, rows: Iterable[Sequence],
                schema: str | T.StructType) -> DataFrame:
    """A small DataFrame of driver-side ``rows`` (tuples/lists/Rows,
    positionally matching ``schema``) built as a pure JVM literal
    plan — the drop-in for ``spark.createDataFrame`` on flag rows and
    lookup tables. An empty ``rows`` yields an empty, correctly-typed
    frame."""
    sch = _schema_of(schema)
    structs = []
    for r in rows:
        vals = ([r.get(f.name) for f in sch.fields]
                if isinstance(r, dict) else r)
        cols = [
            ((F.lit(None) if v is None else F.lit(v))
             .cast(f.dataType).alias(f.name))
            for f, v in zip(sch.fields, vals)
        ]
        structs.append(F.struct(*cols))
    if not structs:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name)
              for f in sch.fields])
    return spark.range(1).select(F.inline(F.array(*structs)))
