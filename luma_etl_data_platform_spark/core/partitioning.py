"""Partitioning helpers.

``spread``: guarantee CPU-bound per-row pipelines (tokenize, shingle,
hash, vector math) get at least default-parallelism partitions. Small
inputs often arrive as one file split → one task → single-threaded
compute; at real scale inputs already have >= cores splits and this
is a no-op (the repartition only fires when under-partitioned).

The partition-count probe (``df.rdd.getNumPartitions()``) physically
plans the frame's subtree — measured 40-95 ms per FRESH DataFrame at
sf0.1, and the work is thrown away (the enclosing query re-plans from
scratch when it executes; round-11 optimization, guide §1.2 "don't
compute things you throw away"). The probe result is therefore
memoized per (session, analyzed-plan semanticHash): semanticHash is
an analysis-only py4j call (~1.5 ms) and two semantically-equal
frames plan to the same partition count in the same session. The memo
only ever shortcuts a PERFORMANCE decision — whether to add a
repartition — never a result (partition layout is
result-independent; the partition-independence gates pin that), so
the one theoretical staleness window (a path-level scan whose
underlying files were rewritten in-session with the same path and
schema) can at worst re-apply the previous repartition decision.
Explicit-file-list reads (the lakehouse read paths) embed the file
names in the analyzed plan, so they can never alias across rewrites.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

# per-session memo keyed on the PYTHON SparkSession object via
# WeakKeyDictionary (ADVICE r11, low): entries die with the session,
# so a stopped-and-collected session's CPython id can never alias a
# new session onto stale partition counts (the old id()-keyed dict
# could). Two python wrappers of one JVM session memoize separately —
# a harmless cache split, never a wrong value.
_NPART_MEMO: "weakref.WeakKeyDictionary[object, dict[int, int]]" = \
    weakref.WeakKeyDictionary()
_NPART_MEMO_MAX = 4096


def spread(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    n = None
    memo = None
    key = None
    try:
        memo = _NPART_MEMO.setdefault(df.sparkSession, {})
        key = df._jdf.queryExecution().analyzed().semanticHash()
        n = memo.get(key)
    except Exception:  # private-API drift: fall back to the probe
        memo = None
    if n is None:
        n = df.rdd.getNumPartitions()
        if memo is not None:
            if len(memo) >= _NPART_MEMO_MAX:
                memo.clear()
            memo[key] = n
    if n < target:
        return df.repartition(target)
    return df
