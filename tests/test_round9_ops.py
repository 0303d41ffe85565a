"""Round-9 operator invariants -- structural properties the oracle hash
cannot see (FIXTURES.md discipline: every operator proves its positive
branch on real data, not just hash parity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sentiment_analysis_data_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_label_propagation_moves_labels(spark):
    out = Q.q_label_propagation_step(spark, SF)
    rows = out.collect()
    assert len(rows) == 500
    # positive branch: at least one node adopted a neighbor group's label
    assert sum(r["changed"] for r in rows) > 0
    # a new label is always some doc's seed label (propagation, not invention)
    seeds = {r["label0"] for r in rows}
    assert all(r["label1"] in seeds for r in rows)
    # changed flag is consistent with the label pair
    assert all((r["label1"] != r["label0"]) == (r["changed"] == 1) for r in rows)


def test_attribution_models_reconcile(spark):
    out = {(r["model"], r["channel"]): r for r in Q.q_attribution_touch(spark, SF).collect()}
    Q._events_view(spark, SF)
    purchases = spark.sql(
        "SELECT cast(count(*) as bigint) AS n,"
        " cast(sum(cast(value as decimal(18,6))) as double) AS rev"
        " FROM events WHERE event_type = 'purchase'"
    ).collect()[0]
    for model in ("first_touch", "last_touch"):
        cells = [v for (m, _), v in out.items() if m == model]
        assert sum(c["n_conversions"] for c in cells) == purchases["n"]
        assert abs(sum(c["attributed_revenue"] for c in cells) - purchases["rev"]) < 1e-6
    # both touch channels attributed somewhere (positive branch)
    assert any(ch in ("click", "view") and v["n_conversions"] > 0 for (m, ch), v in out.items())


def test_packing_curve_accounting(spark):
    rows = {r["ctx"]: r for r in Q.q_packing_efficiency_curve(spark, SF).collect()}
    assert set(rows) == set(Q.PACK_CONTEXTS)
    total = next(iter(rows.values()))["total_tokens"]
    prev_kept = -1
    for ctx in sorted(rows):
        r = rows[ctx]
        assert r["total_tokens"] == total
        assert r["kept_tokens"] + r["truncated_tokens"] == total
        assert r["kept_tokens"] >= prev_kept  # longer context never loses tokens
        prev_kept = r["kept_tokens"]
        cap = r["packed_seqs"] * ctx
        assert cap >= r["kept_tokens"] > cap - ctx  # ceil is tight
        assert 0.0 < r["packed_efficiency"] <= 1.0
        assert 0.0 < r["padded_efficiency"] <= r["packed_efficiency"] + 1e-12
    # the truncation branch is EXERCISED at the small end (FIXTURES.md trap)
    assert rows[min(rows)]["truncated_tokens"] > 0
    assert rows[min(rows)]["docs_fit"] < rows[min(rows)]["n_docs"]


def test_range_bounds_balance_and_order(spark):
    rows = sorted(
        Q.q_range_partition_bounds(spark, SF).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == list(range(1, Q.RANGE_PARTS + 1))
    n_total = sum(r["n_rows"] for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert n_total == li
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # interpolated-quantile bounds are strictly increasing; last is +inf
    bounds = [r["upper_bound"] for r in rows]
    assert bounds[-1] == float("inf")
    assert all(bounds[i] < bounds[i + 1] for i in range(len(bounds) - 1))
    # balance: exact quantile boundaries give near-equal partitions
    assert max(r["n_rows"] for r in rows) <= 2 * min(r["n_rows"] for r in rows)


def test_dataset_card_cross_checks(spark):
    card = Q.q_dataset_card(spark, SF).collect()[0].asDict()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert card["n_docs"] == docs.count()
    assert card["n_sources"] == docs.select("source").distinct().count()
    assert 0.0 < card["predicted_en_share"] <= 1.0
    assert card["p50_doc_tokens"] > 0
    assert card["mean_chars"] > 0
    # exact-dup membership matches an independent md5-group computation
    dup = docs.selectExpr("md5(coalesce(text, '')) AS th").groupBy("th").count()
    expect = dup.filter("count > 1").agg(F.sum("count")).collect()[0][0] or 0
    assert card["exact_dup_docs"] == expect


def test_ngram_novelty_positive_and_bounded(spark):
    rows = Q.q_ngram_novelty(spark, SF).collect()
    assert len(rows) == 50  # one row per new-batch doc, absent docs included
    assert all(0.0 <= r["novelty"] <= 1.0 for r in rows)
    assert all(r["n_unseen"] <= r["n_shingles"] for r in rows)
    # positive branch both ways: some shingles unseen, some seen
    assert sum(r["n_unseen"] for r in rows) > 0
    assert any(r["n_unseen"] < r["n_shingles"] for r in rows)


def test_cosine_sweep_monotone(spark):
    rows = sorted(
        Q.q_cosine_threshold_sweep(spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == sorted(Q.COSINE_SWEEP_THRESHOLDS)
    # tightening the threshold never adds pairs or docs
    for a, b in zip(rows, rows[1:]):
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["n_docs"] <= a["n_docs"]
    assert rows[0]["n_pairs"] > 0  # loosest cut survives something
    # every pair contributes at most 2 docs
    assert all(r["n_docs"] <= 2 * r["n_pairs"] for r in rows)


def test_graph_modularity_beats_null_model(spark):
    card = Q.q_graph_modularity(spark, SF).collect()[0].asDict()
    assert card["n_edges"] > 0
    assert 0 <= card["intra_edges"] <= card["n_edges"]
    # the LPA partition must beat the null model; Q is bounded by 1
    assert 0.0 < card["modularity"] <= 1.0
    assert card["n_connected_clusters"] <= card["n_clusters"]
