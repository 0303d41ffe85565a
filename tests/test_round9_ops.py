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


# --- wave 3 ---

SF01 = "/root/testdata/sf0.01"


def test_classifier_auc_hand_computed_with_ties(spark):
    """Pin the tie-corrected Mann-Whitney fold against a hand-computed AUC
    on a constructed fixture that exercises every branch: score ties
    within a class, a MIXED-class tie (the +neg_s half-credit term), and
    the degenerate single-class source (chance sentinel 0.5)."""
    from sentiment_analysis_data_pipeline_spark.functions import dialect as D

    # text/n_chars drive x1..x3; identical text => identical sq (a tie).
    rows = [
        # srcA: 2 pos, 2 neg; one pos/neg pair shares identical text (tie)
        (0, "srcA", "alpha beta gamma", "en"),
        (1, "srcA", "alpha beta gamma", "fr"),
        (2, "srcA", "a much longer document with many more words here", "en"),
        (3, "srcA", "tiny", "fr"),
        # srcB: all positive -> degenerate, AUC sentinel 0.5
        (4, "srcB", "one", "en"),
        (5, "srcB", "two words", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, lang string")
    df = df.withColumn("n_chars", F.length("text"))
    df.createOrReplaceTempView("documents")
    out = {r["source"]: r for r in spark.sql(Q._classifier_auc_sql(D.SPARK)).collect()}

    # hand-compute srcA from the (sq, y) multiset: rank the 2x2 grid
    scored = [
        (r["sq"], r["y"])
        for r in spark.sql(Q._clf_scored_sql(D.SPARK)).collect()
        if r["source"] == "srcA"
    ]
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]
    num = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg)
    assert out["srcA"]["auc"] == num / (len(pos) * len(neg))
    # the mixed-class tie actually happened (docs 0/1 share text)
    assert len(set(pos) & set(neg)) == 1
    assert out["srcB"]["auc"] == 0.5 and out["srcB"]["n_neg"] == 0
    assert out["ALL"]["n_pos"] == 4 and out["ALL"]["n_neg"] == 2
    assert abs(out["srcA"]["gini"] - (2 * out["srcA"]["auc"] - 1)) < 1e-15


def test_classifier_calibration_accounting(spark):
    rows = Q.q_classifier_calibration(spark, SF01).collect()
    assert len(rows) >= 3  # 0.02 bands keep the diagram multi-row
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert 0.0 <= r["mean_pred"] <= 1.0 and 0.0 <= r["pos_rate"] <= 1.0
        assert abs(r["gap"] - (r["pos_rate"] - r["mean_pred"])) < 1e-12
        assert 0.0 <= r["brier"] <= 1.0
        # a band's mean prediction sits inside the band (quantized floor)
        assert r["band"] * 0.02 <= r["mean_pred"] < (r["band"] + 1) * 0.02 + 1e-9


def test_pareto_frontier_is_exact_skyline(spark):
    pts = spark.read.parquet(f"{SF01}/part.parquet").collect()
    frontier = Q.q_pareto_frontier(spark, SF01).collect()
    got = {(r["ptype"], r["partkey"]) for r in frontier}
    # brute-force dominance oracle per type
    import math
    by_type: dict[str, list] = {}
    for p in pts:
        cents = math.floor(p["p_retailprice"] * 100.0 + 0.5)
        by_type.setdefault(p["p_type"], []).append((p["p_partkey"], cents, p["p_size"]))
    want = set()
    for t, items in by_type.items():
        for k, c, s in items:
            dominated = any(
                (c2 < c and s2 >= s) or (c2 <= c and s2 > s)
                for (k2, c2, s2) in items
                if k2 != k
            )
            if not dominated:
                want.add((t, k))
    assert got == want and len(got) > 0


def test_sorted_neighborhood_shape(spark):
    rows = Q.q_sorted_neighborhood_pairs(spark, SF01).collect()
    n_cust = spark.read.parquet(f"{SF01}/customer.parquet").count()
    # each row pairs with <= SN_WINDOW-1 successors; blocks lose tail rows
    assert 0 < len(rows) <= n_cust * (Q.SN_WINDOW - 1)
    flags = {r["is_candidate"] for r in rows}
    assert flags == {0, 1}  # both branches live
    assert all(r["diff_cents"] >= 0 for r in rows)
    assert all(r["cust_a"] != r["cust_b"] for r in rows)


def test_zonemap_audit_contrast(spark):
    rows = Q.q_zonemap_audit(spark, SF01).collect()
    by = {(r["pred"], r["layout"]): r for r in rows}
    # aligned layout prunes the mid-price probe, misaligned one does not
    assert by[("pc_mid", "price")]["skip_fraction"] > 0.5
    assert by[("pc_mid", "orderkey")]["skip_fraction"] == 0.0
    for r in rows:
        assert 0 <= r["n_pruned"] <= r["n_buckets"]
        assert 0 <= r["rows_skipped"] <= r["n_rows"]


def test_ewma_revenue_exactness(spark):
    rows = sorted(Q.q_ewma_revenue(spark, SF01).collect(), key=lambda r: r["month_index"])
    rev = {r["month_index"]: r["rev_cents"] for r in rows}
    L = Q.EWMA_LAGS
    for r in rows:
        num = den = 0
        for g in range(L):
            v = rev.get(r["month_index"] - g)
            if v is not None:
                w = 1 << (L - 1 - g)
                num += v * w
                den += w
        assert r["ewma_cents"] == num / den
        assert r["n_hist"] <= L
    assert any(r["n_hist"] == L for r in rows)  # full-kernel branch live
    assert rows[0]["n_hist"] == 1  # first month renormalizes, not decays


def test_kcore_step_invariants(spark):
    r = Q.q_kcore_step(spark, SF01).collect()[0]
    assert 0 < r["n_core_nodes"] < r["n_nodes"]  # peel removed SOME, not all
    assert 0 < r["n_surv_edges"] <= r["n_edges"]
    assert 0 <= r["n_below_next"] <= r["n_core_nodes"]
    # self-calibrating threshold: ceil(2E/V)
    assert r["k"] == -((-2 * r["n_edges"]) // r["n_nodes"])


def test_association_rules_math(spark):
    rows = Q.q_association_rules(spark, SF01).collect()
    assert len(rows) == Q.RULES_TOP
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["support"] >= Q.RULES_MIN_SUPPORT
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0.0


def test_audio_loudness_real_decode(spark):
    from sentiment_analysis_data_pipeline_spark.operators.multimodal import (
        parse_pcm_loudness,
    )

    # unit: hand-built WAV, 4 samples [1000, -1000, 500, -500]
    import struct

    data = struct.pack("<4h", 1000, -1000, 500, -500)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    fmt, n, peak, rms, zc = parse_pcm_loudness(wav)
    assert (fmt, n, peak, zc) == ("wav", 4, 1000, 3)
    assert rms == ((1000**2 + 500**2) / 2) ** 0.5
    assert parse_pcm_loudness(b"garbage") == (None,) * 5
    # truncated data chunk must classify, not throw
    assert parse_pcm_loudness(wav[:-2]) == (None,) * 5

    rows = Q.q_audio_loudness(spark, SF01).collect()
    ok = [r for r in rows if r["fmt"] == "wav"]
    assert len(rows) == 500 and len(ok) == 500 - len(
        [r for r in rows if r["fmt"] is None]
    )
    assert all(r["peak"] > 0 and r["rms"] > 0 for r in ok)
    assert all(r["zero_crossings"] == r["n_samples"] - 1 for r in ok)
