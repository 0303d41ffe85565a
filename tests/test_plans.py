"""Physical-plan regression tests: the PLANS.md audit claims, asserted.

Each headline query's scale-critical plan feature (pushdown, broadcast,
top-k operator, single Expand, generator fan-out) is checked against the
compiled physical plan, so a refactor that silently degrades a plan --
e.g. a filter that stops reaching the scan, a broadcast that becomes a
shuffle -- fails CI instead of surfacing at 100 TB.

Plans are inspected pre-execution (initial sparkPlan under AQE): join
STRATEGIES and scan pushdown are decided at compile time; AQE may only
further improve them at runtime.
"""

from __future__ import annotations

import contextlib
import io

from sentiment_analysis_data_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _run(spark, name):
    fn, _ = Q.REGISTRY[name]
    return _plan(fn(spark, SF))


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _run(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ReadSchema prunes to the handful of consumed columns, not all 16
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_comment" not in rs[0]


def test_top_customer_revenue_broadcast_and_topk(spark):
    plan = _run(spark, "top_customer_revenue")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_cosine_topk_streams_corpus(spark):
    plan = _run(spark, "cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row query side broadcast
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # corpus is never join-shuffled


def test_decontaminate_broadcasts_eval_side(spark):
    plan = _run(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # training side never join-shuffled


def test_grouping_sets_single_expand(spark):
    plan = _run(spark, "grouping_sets_summary")
    # formatted explain lists each node once in the tree and once in detail
    assert plan.count("Expand") <= 4
    assert "Expand" in plan


def test_sliding_window_pushdown_and_constant_fanout(spark):
    plan = _run(spark, "sliding_window_agg")
    assert "PushedFilters: [IsNotNull(value)]" in plan
    assert "Generate" in plan
    assert "Join" not in plan  # integer-hop explode replaces any self-join


def test_pmi_topk_operator(spark):
    plan = _run(spark, "pmi_collocations")
    assert "TakeOrderedAndProject" in plan  # never a global vocabulary sort


def test_phrase_search_projection_only(spark):
    plan = _run(spark, "phrase_search")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan  # adjacency filter stays inside one projection
    assert "Generate" not in plan  # no explode: positions array never leaves its task


def test_more_like_this_broadcasts_seed_terms(spark):
    plan = _run(spark, "more_like_this")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_chunk_documents_no_join(spark):
    plan = _run(spark, "chunk_documents")
    assert "Generate" in plan  # computed-range explode
    assert "Join" not in plan
    assert "Window" not in plan


def test_kmeans_step_argmax_is_aggregate(spark):
    """The nearest-centroid choice must be the packed-BIGINT max() aggregate
    (map-side partial, n rows shuffled), never a row_number window over the
    n*k scored cross product."""
    plan = _run(spark, "kmeans_step")
    assert "BroadcastNestedLoopJoin" in plan  # codebook broadcast
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_domain_quota_single_window_no_join(spark):
    plan = _run(spark, "domain_quota_sample")
    assert "Window" in plan
    assert "Join" not in plan


def test_zipf_slope_topk_operator(spark):
    plan = _run(spark, "zipf_slope")
    assert "TakeOrderedAndProject" in plan  # never a global vocabulary sort


def test_event_transitions_topk_operator(spark):
    plan = _run(spark, "event_transitions")
    assert "TakeOrderedAndProject" in plan


def test_top_percent_customers_broadcast_dims(spark):
    plan = _run(spark, "top_percent_customers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_decontaminate_broadcasts_eval(spark):
    """Eval side broadcast (BroadcastNestedLoopJoin); the corpus streams
    through the max-agg without ever being join-shuffled."""
    plan = _run(spark, "semantic_decontaminate")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_embedding_standardize_no_join(spark):
    """fit = explode -> ONE dim-keyed partial agg; no join, no window."""
    plan = _run(spark, "embedding_standardize")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_frame_sample_pure_fanout(spark):
    """Generate fan-out only -- no join/window/agg; per-frame rows stay
    partition-parallel for the downstream decode."""
    plan = _run(spark, "frame_sample")
    assert "Generate" in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_hybrid_rrf_topk_arms(spark):
    """Both fusion arms are top-k (TakeOrderedAndProject); the full-outer
    fusion join sees only 2*k rows (full outer cannot broadcast -- the SMJ
    is over 20-row inputs by construction)."""
    plan = _run(spark, "hybrid_search_rrf")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_temperature_resample_corpus_join_broadcast(spark):
    """The corpus-sized ranked relation meets the per-source target
    relation through a BroadcastHashJoin (targets are sources-sized);
    exactly one corpus window shuffle (rank within source)."""
    plan = _run(spark, "temperature_resample")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_perplexity_bands_no_window(spark):
    """LM and left-context relations are vocabulary-sized broadcast joins;
    per-doc and per-band rollups are partial aggs -- no window anywhere."""
    plan = _run(spark, "perplexity_bands")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_part_supplier_counts_anti_join_and_topk(spark):
    """q16 shape: NOT IN decorrelates to a broadcast anti-join; top-100
    via TakeOrderedAndProject."""
    plan = _run(spark, "part_supplier_counts")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_source_drift_single_agg_broadcast_total(spark):
    """One (source) partial agg; the 1-row margin relation comes back as a
    broadcast -- no window, no corpus re-scan."""
    plan = _run(spark, "source_drift")
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_pca_power_step_single_pass_no_gram_join(spark):
    """The matvec must be the single-pass explode+agg (linear in rows),
    never a component-pair self-join materializing the Gram matrix."""
    plan = _run(spark, "pca_power_step")
    assert "Generate" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_copurchase_pairs_topk_and_basket_join(spark):
    plan = _run(spark, "copurchase_pairs")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_table_checksum_no_joins(spark):
    plan = _run(spark, "table_checksum")
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_bm25_indexed_reads_postings_not_text(spark):
    """Query-time plan must contain NO tokenizer work: the documents scan
    appears only for the 1-row corpus count (ReadSchema without `text`),
    and scoring reads the bucketed postings table."""
    plan = _run(spark, "bm25_search_indexed")
    assert "TakeOrderedAndProject" in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and all("text" not in ln for ln in rs)


def test_classifier_score_broadcast_weights_no_shuffle_join(spark):
    # the 1-row stepped-weights relation reaches every doc via a broadcast
    # nested-loop cross join -- never a shuffled CartesianProduct; the only
    # wide operators are the gradient agg and the (source, band) histogram
    plan = _run(spark, "classifier_score")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_fk_integrity_aggregates_child_before_parent_join(spark):
    # scale claim: each child collapses to distinct-FK granularity BEFORE
    # meeting its parent (HashAggregate feeds the join build/stream side),
    # and small dim parents broadcast -- no shuffle join anywhere at the
    # dims, no cartesian
    plan = _run(spark, "fk_integrity")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # every edge pre-aggregates: 7 edges x (partial+final) key aggs present
    assert plan.count("HashAggregate") >= 14


# ---------------------------------------------------- r7 continuation ops


def test_hdr_quantiles_partial_agg_and_no_cartesian(spark):
    """The hist arm must collapse map-side (partial_ forms of the
    (segment, idx) aggregate) before its shuffle; the tiny est/exact
    combine joins stay off cartesian fallbacks."""
    plan = _run(spark, "hdr_quantiles")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_join_size_sketch_sides_never_meet_raw(spark):
    """Scale claim: the two sketched sides meet only at sketch granularity
    -- the inner-product join's inputs are the (j, col)-keyed aggregates
    (partial_sum forms present, map-side collapse before the shuffle). The
    plan's only nested-loop joins are the 1-row served/exact combines
    (BNLJ Cross over BroadcastExchange of single-row aggregates -- the
    bounded-combine shape, not a fan-out); never a shuffled
    CartesianProduct."""
    plan = _run(spark, "join_size_sketch")
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    # every BNLJ is a 1-row cross combine (2 joins; "formatted" prints
    # each node twice -- tree line + detail block)
    assert plan.count("BroadcastNestedLoopJoin") <= 4


def test_weighted_sample_no_global_sort(spark):
    """The ES top-k is per-stratum window work: no global Sort over an
    un-partitioned exchange of the full doc relation (the window sorts
    WITHIN source partitions)."""
    plan = _run(spark, "weighted_sample")
    assert "hashpartitioning(source" in plan
    # rangepartitioning = a global ORDER BY crept in
    assert "rangepartitioning" not in plan


def test_k_anonymity_single_class_aggregate(spark):
    """The table collapses to equivalence classes in ONE partial+final
    aggregate; threshold work happens against the class relation."""
    plan = _run(spark, "k_anonymity")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan  # VALUES join is broadcast


def test_audio_metadata_pure_projection(spark):
    """Header decode is scan -> synthesize -> mapInPandas: the only
    Exchange is the deliberate round-robin scatter of the single-file
    documents table (sources/tables.scattered) -- never a KEYED shuffle in
    the decode lineage."""
    plan = _run(spark, "audio_metadata")
    assert "MapInPandas" in plan
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_interval_overlap_equi_join_only(spark):
    plan = _run(spark, "interval_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gt_discounts_single_vocab_pass(spark):
    """The vocabulary-sized bigram aggregate feeds count-of-counts once;
    totals derive from count-of-counts, so the plan holds exactly one
    bigram-relation aggregate pair (partial+final over bg)."""
    plan = _run(spark, "gt_discounts")
    # one partial_count over the bigram keys (the vocab agg), and no
    # second explode chain: a single Generate from the token arrays
    assert plan.count("Generate explode") <= 1
    assert "CartesianProduct" not in plan
