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
