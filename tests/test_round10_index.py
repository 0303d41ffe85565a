"""Round-10 stamped-index pins: the persisted simhash edge table and the
banding-sweep signature/truth tables must agree EXACTLY with their
in-session single-statement builds -- that agreement is the whole safety
argument for the write-once-read-cheap ladder (the oracle gates values,
these tests gate the persistence layer itself: stamp reuse, rebuild on a
new snapshot, and pair-for-pair equality)."""

from __future__ import annotations

import os

from sentiment_analysis_data_pipeline_spark import queries as Q
from sentiment_analysis_data_pipeline_spark.functions import dialect as D
from sentiment_analysis_data_pipeline_spark.sources.tables import (
    drop_table_with_files,
    read_stamp,
)

SF = "/root/testdata/sf0.001"


def _warehouse_loc(table: str) -> str:
    from sentiment_analysis_data_pipeline_spark.sources.tables import (
        _warehouse_dir,
    )

    return os.path.join(_warehouse_dir(), table.lower())


def test_simhash_edge_table_matches_in_session_pairs(spark):
    table = Q._ensure_simhash_edge_table(spark, SF)
    stored = {
        (r["id_a"], r["id_b"])
        for r in spark.table(table).select("id_a", "id_b").collect()
    }
    live = {
        (r["id_a"], r["id_b"])
        for r in Q._simhash_pairs_df(spark, SF).select("id_a", "id_b").collect()
    }
    assert stored == live
    assert stored, "edge relation empty at sf0.001 -- fixture regression"
    # stamp present and the second ensure reuses (no rebuild: same table name)
    assert read_stamp(_warehouse_loc(table)) is not None
    assert Q._ensure_simhash_edge_table(spark, SF) == table


def test_sweep_index_matches_in_session_build(spark):
    sigs_t, truth_t = Q._ensure_sweep_index(spark, SF)
    # persisted sigs == in-session signature pass
    Q._view(spark, SF, "documents")
    hashed = spark.sql(Q._sweep_hashed_sql(D.SPARK))
    hashed.localCheckpoint(eager=True).createOrReplaceTempView("t10_hashed")
    live_sigs = {
        tuple(r)
        for r in spark.sql(
            Q._sweep_sigs_from(D.SPARK, "SELECT doc, h FROM t10_hashed")
        ).collect()
    }
    stored_sigs = {tuple(r) for r in spark.table(sigs_t).collect()}
    assert stored_sigs == live_sigs
    # persisted truth == in-session capped-Jaccard truth
    capped = spark.sql(
        Q._sweep_capped_from(D.SPARK, "SELECT doc, h FROM t10_hashed")
    )
    capped.localCheckpoint(eager=True).createOrReplaceTempView("t10_capped")
    live_truth = {
        (r["id_a"], r["id_b"])
        for r in spark.sql(
            Q._sweep_truth_from(D.SPARK, "SELECT doc, sh FROM t10_capped")
        ).collect()
    }
    stored_truth = {
        (r["id_a"], r["id_b"]) for r in spark.table(truth_t).collect()
    }
    assert stored_truth == live_truth
    assert stored_truth, "truth relation empty at sf0.001 -- fixture regression"


def test_stale_stamp_triggers_rebuild(spark):
    """A wrong stamp must be treated as 'no copy': the ensure call rebuilds
    rather than serving another snapshot's artifact (the refresh policy the
    index docstrings promise)."""
    table = Q._ensure_simhash_edge_table(spark, SF)
    loc = _warehouse_loc(table)
    n_before = spark.table(table).count()
    with open(os.path.join(loc, "_corpus_stamp"), "w") as f:
        f.write("stale-fingerprint")
    spark.catalog.dropTempView("documents") if "documents" in [
        t.name for t in spark.catalog.listTables()
    ] else None
    # session catalog still has the table, but the stamp mismatch forces
    # the rebuild path straight through ensure_stamped_table
    table2 = Q._ensure_simhash_edge_table(spark, SF)
    assert table2 == table
    assert read_stamp(loc) != "stale-fingerprint"
    assert spark.table(table2).count() == n_before


def test_graph_family_reads_persisted_edges(spark):
    """The five graph consumers must produce identical results off the
    stored edges as their oracles' in-session edge builds imply -- spot
    statement: dedup_clusters components are unchanged after the switch."""
    comp = {
        (r["doc_id"], r["component"])
        for r in Q.q_dedup_clusters(spark, SF).collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    oracle = {
        (a, b)
        for a, b in con.execute(Q._dedup_clusters_sql(D.DUCKDB)).fetchall()
    }
    assert comp == oracle


def test_drop_and_rebuild_roundtrip(spark):
    """drop_table_with_files followed by ensure rebuilds an identical
    relation (the maintenance path tests/test_stamped_index.py uses,
    replayed for the new edge table)."""
    table = Q._ensure_simhash_edge_table(spark, SF)
    before = {tuple(r) for r in spark.table(table).collect()}
    assert drop_table_with_files(spark, table)
    table2 = Q._ensure_simhash_edge_table(spark, SF)
    after = {tuple(r) for r in spark.table(table2).collect()}
    assert before == after


def test_wmh_index_matches_in_session_build(spark):
    tfc_t, sigs_t = Q._ensure_wmh_index(spark, SF)
    Q._view(spark, SF, "documents")
    live_tfc = {tuple(r) for r in spark.sql(Q._wmh_tf_sql(D.SPARK)).collect()}
    stored_tfc = {tuple(r) for r in spark.table(tfc_t).collect()}
    assert stored_tfc == live_tfc
    live_sigs = {
        tuple(r)
        for r in spark.sql(
            Q._wminhash_sigs_sql(D.SPARK, Q._wmh_tf_sql(D.SPARK))
        ).collect()
    }
    stored_sigs = {tuple(r) for r in spark.table(sigs_t).collect()}
    assert stored_sigs == live_sigs


def test_wminhash_pairs_unchanged_off_persisted_index(spark):
    """The persisted-index read path must emit the exact pair set (ids AND
    weighted-Jaccard doubles) of the single-statement build."""
    got = {tuple(r) for r in Q.q_wminhash_pairs(spark, SF).collect()}
    Q._view(spark, SF, "documents")
    ref = {tuple(r) for r in spark.sql(Q._wminhash_sql(D.SPARK)).collect()}
    assert got == ref


def test_minhash_edge_table_matches_verified_pairs(spark):
    table = Q._ensure_minhash_edge_table(spark, SF)
    stored = {
        (r["id_a"], r["id_b"]) for r in spark.table(table).collect()
    }
    live = {
        (r["id_a"], r["id_b"])
        for r in Q.q_minhash_pairs(spark, SF).collect()
    }
    assert stored == live
    assert stored, "minhash edge relation empty at sf0.001"
