"""Distributed metadata plane for the commit-log lakehouse.

The JSON commit log is exactly right at 10²–10³ files: replay is a
handful of driver-side ``json.loads`` and a point lookup needs no
Spark job at all. At 100-TB file counts (10⁵–10⁶ add-actions, each
carrying per-column stats and Bloom lanes up to ~0.5 MB) the
checkpoint becomes a multi-GB single-threaded driver parse — the one
remaining scale-killer shape called out by the round-4 review. This
module is the Delta-style evolution: the checkpoint's add-action
table is written as PARQUET (one row per live file, typed columns for
every skipping stat), replay becomes "checkpoint-as-DataFrame + JSON
tail", and stat/Bloom pruning runs as a Spark filter job over the
add-action table that returns ONLY the surviving paths to the driver.

Reference anchor: this is the Spark-native completion of the staging
metadata the reference tracks as flat files and loads row-wise
(reference: lambda_function.py:201-243); the format mirrors the Delta
protocol's Parquet checkpoint (Armbrust et al., VLDB'20).

Fidelity contract: ``add_json`` holds the exact JSON of the full
add-action, so reconstructing driver-side dicts is lossless; the
typed columns (``stats_min_num`` … ``bloom_lanes``) are projections
used only for Spark-side pruning and are derived deterministically
from the same dict. Numeric bounds are widened one ULP with
``math.nextafter`` so float projection of wide int64 stats can never
prune a boundary match.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: add-actions at or above this count switch the expire checkpoint to
#: parquet (below it, inline JSON replays faster than a Spark read)
PARQUET_CHECKPOINT_MIN_FILES = 512

#: seeds enumerated by the Spark-side Bloom probe; per-file ``k`` is
#: read from the row and extra seeds are vacuously true, so any table
#: written with bloom_hashes <= this is probed exactly
MAX_BLOOM_SEEDS = 8

CKPT_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("add_json", T.StringType()),
    T.StructField("rows", T.LongType()),
    # file length recorded at write time (Delta records it in every
    # add action) — null on pre-lane history; DESCRIBE falls back to a
    # filesystem probe ONLY for those files
    T.StructField("size_bytes", T.LongType()),
    T.StructField("partition", T.MapType(T.StringType(), T.StringType())),
    # per-file spec identity: partition-key name → the transform
    # string that produced its recorded value (null on pre-lane
    # history and identity-only layouts) — lets a re-declared name
    # (bucket(4,u) → bucket(8,u)) prune per generation
    T.StructField("spec", T.MapType(T.StringType(), T.StringType())),
    T.StructField("has_stats", T.BooleanType()),
    T.StructField("stats_min_num", T.MapType(T.StringType(), T.DoubleType())),
    T.StructField("stats_max_num", T.MapType(T.StringType(), T.DoubleType())),
    T.StructField("stats_min_str", T.MapType(T.StringType(), T.StringType())),
    T.StructField("stats_max_str", T.MapType(T.StringType(), T.StringType())),
    T.StructField("legacy_min", T.StringType()),
    T.StructField("legacy_max", T.StringType()),
    T.StructField("bloom_m", T.MapType(T.StringType(), T.LongType())),
    T.StructField("bloom_k", T.MapType(T.StringType(), T.LongType())),
    T.StructField("bloom_lanes", T.MapType(
        T.StringType(), T.MapType(T.StringType(), T.LongType()))),
])


def _as_float(v) -> float | None:
    """Numeric projection of a commit-log stat; None when the stat is
    not cleanly numeric (bool included — lexical lane handles it)."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    return None


def add_to_row(add: dict) -> dict:
    """Project one add-action dict onto :data:`CKPT_SCHEMA`."""
    stats = add.get("stats") or {}
    mn_num: dict[str, float] = {}
    mx_num: dict[str, float] = {}
    mn_str: dict[str, str] = {}
    mx_str: dict[str, str] = {}
    for c, st in stats.items():
        lo, hi = st.get("min"), st.get("max")
        if lo is not None:
            mn_str[c] = str(lo)
            flo = _as_float(lo)
            if flo is not None:
                mn_num[c] = math.nextafter(flo, -math.inf)
        if hi is not None:
            mx_str[c] = str(hi)
            fhi = _as_float(hi)
            if fhi is not None:
                mx_num[c] = math.nextafter(fhi, math.inf)
    blooms = add.get("blooms") or {}
    part = add.get("partition") or {}
    return dict(
        path=add["path"],
        add_json=json.dumps(add, sort_keys=True),
        rows=add.get("rows"),
        size_bytes=(int(add["size_bytes"])
                    if add.get("size_bytes") is not None else None),
        partition={k: (None if v is None else str(v))
                   for k, v in part.items()},
        spec={k: str(v) for k, v in (add.get("spec") or {}).items()},
        has_stats=bool(stats),
        stats_min_num=mn_num, stats_max_num=mx_num,
        stats_min_str=mn_str, stats_max_str=mx_str,
        legacy_min=str(add["min_key"]) if "min_key" in add else None,
        legacy_max=str(add["max_key"]) if "max_key" in add else None,
        bloom_m={c: int(b["m"]) for c, b in blooms.items()},
        bloom_k={c: int(b["k"]) for c, b in blooms.items()},
        bloom_lanes={c: {lk: int(lv)
                         for lk, lv in (b.get("lanes") or {}).items()}
                     for c, b in blooms.items()},
    )


def adds_to_df(spark: SparkSession, adds: list[dict]) -> DataFrame:
    """Driver-held add-actions (a JSON tail, or a small table's full
    list) as a checkpoint-schema DataFrame."""
    return spark.createDataFrame([add_to_row(a) for a in adds],
                                 schema=CKPT_SCHEMA)


def rows_to_adds(rows) -> list[dict]:
    """Lossless inverse of :func:`add_to_row` over collected rows.

    The typed ``path`` COLUMN is authoritative, not the one embedded
    in ``add_json``: a shallow clone of a parquet-checkpointed source
    rewrites refs to absolute source paths as a DataFrame transform
    on the column alone (rewriting the embedded JSON string would be
    a fragile string surgery for zero information gain)."""
    out = []
    for r in rows:
        d = json.loads(r["add_json"])
        d["path"] = r["path"]
        out.append(d)
    return out


def _probe_kind(v) -> str:
    if isinstance(v, bool):
        return "other"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    return "other"


def _m(col_name: str, key: str) -> Column:
    return F.try_element_at(F.col(col_name), F.lit(key))


def range_keep_condition(ranges: dict[str, tuple],
                         legacy_col: str | None,
                         aliases: dict[str, list[str]] | None = None,
                         ) -> Column:
    """The Spark twin of the driver-side min/max pruning loop: keep a
    file unless some probed column's effective [min, max] is provably
    disjoint from its (lo, hi). Missing/unprojectable stats are
    conservatively kept — identical posture to the JSON path. The
    legacy ``min_key``/``max_key`` lane applies only to ``legacy_col``
    (the table's first declared key) on stat-less add-actions.

    ``aliases`` maps a probed LOGICAL name to its prior physical
    names (rename chain): pre-rename files record stats under their
    write-time name, so the stat lookup coalesces across the chain —
    any file carries stats under exactly one name of it (write
    vintage), and retired names are never reused, so the coalesce is
    unambiguous (see lakehouse._stat_alias_map)."""
    keep = F.lit(True)
    aliases = aliases or {}
    for col, (lo, hi) in ranges.items():
        kinds = {_probe_kind(lo), _probe_kind(hi)}
        if kinds != {"num"} and kinds != {"str"}:
            continue  # non-scalar probe: cannot skip on this column
        names = [col, *aliases.get(col, ())]
        if kinds == {"num"}:
            pv = _m("partition", col).try_cast("double")
            st_lo = F.coalesce(*[_m("stats_min_num", n) for n in names])
            st_hi = F.coalesce(*[_m("stats_max_num", n) for n in names])
            leg_lo = leg_hi = F.lit(None).cast("double")
            if col == legacy_col:
                leg_lo = F.when(~F.col("has_stats"),
                                F.col("legacy_min").try_cast("double"))
                leg_hi = F.when(~F.col("has_stats"),
                                F.col("legacy_max").try_cast("double"))
            plo, phi = F.lit(float(lo)), F.lit(float(hi))
        else:
            pv = _m("partition", col)
            st_lo = F.coalesce(*[_m("stats_min_str", n) for n in names])
            st_hi = F.coalesce(*[_m("stats_max_str", n) for n in names])
            leg_lo = leg_hi = F.lit(None).cast("string")
            if col == legacy_col:
                leg_lo = F.when(~F.col("has_stats"), F.col("legacy_min"))
                leg_hi = F.when(~F.col("has_stats"), F.col("legacy_max"))
            plo, phi = F.lit(lo), F.lit(hi)
        eff_lo = F.coalesce(st_lo, pv, leg_lo)
        eff_hi = F.coalesce(st_hi, pv, leg_hi)
        disjoint = (eff_hi < plo) | (eff_lo > phi)
        keep = keep & ~F.coalesce(disjoint, F.lit(False))
    return keep


def bloom_probe(df: DataFrame, col: str, value,
                alias_names: list[str] | None = None) -> DataFrame:
    """Filter the add-action table through the per-file Bloom filter
    for ``col == value`` — the Spark twin of the driver-side
    ``_bloom_excludes`` probe, bit-identical by construction: the k
    md5 hashes are computed once from ``str(value)`` on the driver and
    reduced modulo each FILE'S own ``m`` executor-side (mixed-size
    filter histories probe correctly). Files with no filter for the
    column are kept. ``alias_names`` (prior physical names from the
    rename chain) extend the filter lookup to pre-rename files; a
    file records a Bloom under exactly one name of the chain, so the
    per-field coalesce can never mix two files' filters."""
    names = [col, *(alias_names or ())]
    m = F.coalesce(*[_m("bloom_m", n) for n in names])
    k = F.coalesce(*[_m("bloom_k", n) for n in names])
    lanes = F.coalesce(*[_m("bloom_lanes", n) for n in names])
    tmp = df
    helper_cols: list[str] = []
    all_set = F.lit(True)
    from ..functions.text import portable_hash32_py
    for s in range(MAX_BLOOM_SEEDS):
        h = portable_hash32_py(str(value), seed=s)
        pos = F.lit(h) % m
        lane_c, bit_c = f"_bl_lane_{s}", f"_bl_bit_{s}"
        helper_cols += [lane_c, bit_c]
        tmp = (tmp
               .withColumn(lane_c, F.try_element_at(
                   lanes, F.floor(pos / F.lit(64))
                   .cast("long").cast("string")))
               .withColumn(bit_c, (pos % 64).cast("int")))
        bit_set = F.expr(
            f"(shiftright(coalesce({lane_c}, 0L), {bit_c}) & 1) = 1")
        all_set = all_set & (F.when(F.lit(s) < k, bit_set)
                             .otherwise(F.lit(True)))
    return tmp.filter(m.isNull() | all_set).drop(*helper_cols)


def amb_keep_condition(amb_probes: dict[str, dict[str, tuple]]) -> Column:
    """The Spark twin of the driver's per-generation partition-value
    lane: for a partition-key name declared with CONFLICTING transform
    strings, a file is skipped only when its OWN recorded spec string
    (the ``spec`` map stamped at write time) matches a derived probe
    AND its recorded value is provably outside it. Files without the
    record (pre-lane history, other generations) are kept."""
    keep = F.lit(True)
    for name, by_spec in (amb_probes or {}).items():
        excluded = F.lit(False)
        for spec_str, (lo, hi) in by_spec.items():
            kinds = {_probe_kind(lo), _probe_kind(hi)}
            if kinds == {"num"}:
                pv = _m("partition", name).try_cast("double")
                plo, phi = F.lit(float(lo)), F.lit(float(hi))
            elif kinds == {"str"}:
                pv = _m("partition", name)
                plo, phi = F.lit(lo), F.lit(hi)
            else:
                continue
            disjoint = (pv < plo) | (pv > phi)
            # coalesce BOTH legs: a null spec lookup (pre-lane rows,
            # old checkpoints without the column) must read as
            # no-match, never as a null that nulls the whole filter
            excluded = excluded | (
                F.coalesce(_m("spec", name) == F.lit(spec_str),
                           F.lit(False))
                & F.coalesce(disjoint, F.lit(False)))
        keep = keep & ~excluded
    return keep


def spark_prune(adds_df: DataFrame, ranges: dict[str, tuple],
                eq: dict, legacy_col: str | None,
                amb_probes: dict[str, dict[str, tuple]] | None = None,
                aliases: dict[str, list[str]] | None = None,
                ) -> list[str]:
    """Run the full stat + Bloom prune as ONE Spark filter job over
    the add-action table; only the surviving relative paths cross back
    to the driver (the stats/Bloom payload never does). ``aliases``
    carries the rename chain's prior physical stat/Bloom keys per
    probed column (see :func:`range_keep_condition`)."""
    df = adds_df.filter(range_keep_condition(ranges, legacy_col, aliases))
    if amb_probes:
        df = df.filter(amb_keep_condition(amb_probes))
    for col, v in (eq or {}).items():
        df = bloom_probe(df, col, v, (aliases or {}).get(col))
    return sorted(r["path"] for r in df.select("path").collect())
