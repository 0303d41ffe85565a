"""Round-11 stamped-index pins (verdict item 2): q_embedding_dedup_pairs
now reads the persisted scored-candidate table, so the retained live
build (_embedding_dedup_pairs_live -- signature -> banded candidates ->
exact-cosine verify, all in-session) must agree with the stored relation
pair-for-pair AND cosine-for-cosine. Same safety argument as
tests/test_round10_index.py: the oracle gates values at sf0.01, these
tests gate the persistence layer itself."""

from __future__ import annotations

from sentiment_analysis_data_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_embedding_pairs_persisted_matches_live(spark):
    stored = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in Q.q_embedding_dedup_pairs(spark, SF).collect()
    }
    live = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in Q._embedding_dedup_pairs_live(spark, SF).collect()
    }
    assert stored == live
    assert stored, "scored relation empty at sf0.001 -- fixture regression"


def test_semantic_clusters_unchanged_by_persisted_read(spark):
    """The clustering fixpoint over persisted edges must equal the one the
    live pair build induces (the recursive-CTE oracle checks values; this
    pins that the EDGE SET feeding CC did not drift)."""
    from sentiment_analysis_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    via_persisted = {
        (r["vec_id"], r["component"])
        for r in Q.q_semantic_clusters(spark, SF).collect()
    }
    live_edges = Q._embedding_dedup_pairs_live(spark, SF).select("id_a", "id_b")
    comp = connected_components(live_edges, edge_spill_table="cc_edges_sem_t11")
    via_live = {(r["node"], r["comp"]) for r in comp.collect()}
    assert via_persisted == via_live


def test_wminhash_pair_cap_bounds_cluster_output(spark):
    """VERDICT r10 item 5: a dup cluster of n docs must emit <= WMH_PAIR_CAP
    pairs per anchor (not n(n-1)/2 total), with the suppression ACCOUNTED in
    pairs_suppressed_a. 12 near-identical docs (tiny distinct suffixes keep
    ids distinct but J_w ~ 1): uncapped emit would be 66 pairs; anchor 0
    qualifies against all 11 others, so it must emit exactly WMH_PAIR_CAP
    rows each carrying pairs_suppressed_a = 11 - cap."""
    from sentiment_analysis_data_pipeline_spark import queries as Q

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
    ) * 3
    rows = [(i, base, "en", "s", 1) for i in range(12)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    out = spark.sql(Q._wminhash_sql(Q.D.SPARK)).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["id_a"], []).append(r)
    assert by_anchor, "cluster produced no pairs -- fixture regression"
    for anchor, emitted in by_anchor.items():
        assert len(emitted) <= Q.WMH_PAIR_CAP
    # anchor 0 qualifies vs all 11 others (identical bags, J_w = 1.0)
    a0 = by_anchor[0]
    assert len(a0) == Q.WMH_PAIR_CAP
    assert all(r["pairs_suppressed_a"] == 11 - Q.WMH_PAIR_CAP for r in a0)
    # 11 candidates < WMH_VERIFY_CAP: nothing pruned before verify
    assert all(r["cands_pruned_a"] == 0 for r in out)
    # total emit is per-anchor-linear, not quadratic
    assert len(out) <= 12 * Q.WMH_PAIR_CAP < 66


def test_wminhash_verify_cap_bounds_verify_volume(spark):
    """A 22-doc identical cluster: anchor 0 has 21 prefilter candidates, so
    21 - WMH_VERIFY_CAP = 5 never reach the exact verify (cands_pruned_a),
    and of the 16 verified qualifying pairs only WMH_PAIR_CAP emit with
    pairs_suppressed_a = 16 - cap."""
    from sentiment_analysis_data_pipeline_spark import queries as Q

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
    ) * 3
    rows = [(i, base, "en", "s", 1) for i in range(22)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    out = [r for r in spark.sql(Q._wminhash_sql(Q.D.SPARK)).collect() if r["id_a"] == 0]
    assert len(out) == Q.WMH_PAIR_CAP
    assert all(r["cands_pruned_a"] == 21 - Q.WMH_VERIFY_CAP for r in out)
    assert all(
        r["pairs_suppressed_a"] == Q.WMH_VERIFY_CAP - Q.WMH_PAIR_CAP for r in out
    )
