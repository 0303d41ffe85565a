"""Pins for the round-11 optimization rewrites: every equivalence the
optimized Spark paths rely on is asserted against the original form, so a
future edit cannot silently diverge the fast path from the oracle's
semantics.

Covered (OPTIMIZATION_r11.md):
  - basket-explode pair generation == lineitem equi-self-join pair set
    (copurchase/association_rules/kcore edge source);
  - wminhash array-packed zip_with match count == the 32-term CASE sum;
  - kcenter zip_with/aggregate squared-L2 fold is BITWISE the flat
    l2sq_literal chain;
  - kcore one-aggregate tail (handshake lemma) == the three scalar
    subqueries;
  - dim_truncation window-chain + stack unpivot == the 4-window + join
    form;
  - scattered() size gate: small file -> repartition, large file -> no-op.
"""

from __future__ import annotations

import os

import pytest

import sentiment_analysis_data_pipeline_spark.queries as Q
from sentiment_analysis_data_pipeline_spark.functions import dialect as D
from sentiment_analysis_data_pipeline_spark.sources.tables import scattered

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def sf_views(spark):
    Q._view(spark, SF_DIR, "lineitem", "documents", "embeddings")
    return spark


def test_basket_explode_matches_self_join(sf_views):
    spark = sf_views
    joined = spark.sql(
        """SELECT DISTINCT a.l_orderkey, a.l_partkey AS part_a,
                  b.l_partkey AS part_b
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    )
    basket = spark.sql(
        f"WITH {Q._BASKET_PAIRS_SPARK} SELECT l_orderkey, part_a, part_b FROM pairs"
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, basket.collect())
    )


def test_wminhash_array_match_count_equals_case_sum(sf_views):
    spark = sf_views
    # two fixed 32-component signatures with a known number of equal slots
    a = [i for i in range(Q.WMH_K)]
    b = [i if i % 3 == 0 else 10_000 + i for i in range(Q.WMH_K)]
    expected = sum(1 for i in range(Q.WMH_K) if a[i] == b[i])
    arr = lambda v: "array(" + ", ".join(str(x) for x in v) + ")"  # noqa: E731
    row = spark.sql(
        f"""SELECT cast(aggregate(zip_with({arr(a)}, {arr(b)},
                (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
                0, (acc, e) -> acc + e) as bigint) AS m"""
    ).collect()[0]
    assert row["m"] == expected


def test_kcenter_zipwith_fold_bitwise_equals_literal_chain(sf_views):
    spark = sf_views
    vec = [0.1 * i - 1.7 for i in range(Q.EMB_DIM)]
    v = Q.V.to_double_array(D.SPARK, "embedding")
    lit_chain = Q.V.l2sq_literal(D.SPARK, "v", vec)
    arr = "array(" + ", ".join(repr(x) for x in vec) + ")"
    fold = (
        f"aggregate(zip_with(v, {arr}, (x, y) -> (x - y) * (x - y)),"
        " cast(0.0 as double), (acc, e) -> acc + e)"
    )
    rows = spark.sql(
        f"""SELECT {lit_chain} AS a, {fold} AS b
            FROM (SELECT {v} AS v FROM embeddings) e"""
    ).collect()
    assert rows, "embeddings fixture empty"
    for r in rows:
        # bitwise: the fold is 0.0 + t1 + ... + t64 over the same
        # left-associated terms, and 0.0 + t == t for non-negative squares
        assert r["a"] == r["b"] and str(r["a"]) == str(r["b"])


def test_kcore_handshake_tail_equals_scalar_subqueries(sf_views):
    spark = sf_views
    edges = spark.sql(Q._KCORE_EDGES_SQL)
    edges.localCheckpoint(eager=True).createOrReplaceTempView("t11_edges")
    deg = spark.sql(
        """SELECT node, cast(count(*) as bigint) AS degree
           FROM (SELECT id_a AS node FROM t11_edges
                 UNION ALL SELECT id_b AS node FROM t11_edges) u
           GROUP BY node"""
    )
    deg.localCheckpoint(eager=True).createOrReplaceTempView("t11_deg")
    core = spark.sql(
        f"""SELECT d2.node FROM t11_deg d2 CROSS JOIN (
               SELECT case when n_nodes = 0 then cast(0 as bigint)
                      else {D.int_div(D.SPARK, "(2 * n_edges + n_nodes - 1)", "n_nodes")}
                      end AS k
               FROM (SELECT cast((SELECT count(*) FROM t11_edges) as bigint) AS n_edges,
                            cast((SELECT count(*) FROM t11_deg) as bigint) AS n_nodes) s) kv
           WHERE d2.degree >= kv.k"""
    )
    core.localCheckpoint(eager=True).createOrReplaceTempView("t11_core")
    new = spark.sql(
        Q._kcore_tail_over(
            D.SPARK,
            "SELECT id_a, id_b FROM t11_edges",
            "SELECT node, degree FROM t11_deg",
            "SELECT node FROM t11_core",
        )
    ).collect()
    old = spark.sql(
        Q._kcore_tail(D.SPARK, "SELECT id_a, id_b FROM t11_edges")
    ).collect()
    assert [tuple(r) for r in new] == [tuple(r) for r in old]


def test_dim_truncation_stack_form_equals_join_form(sf_views):
    spark = sf_views
    new = Q.q_dim_truncation_recall(spark, SF_DIR).collect()
    old = spark.sql(Q._dim_truncation_sql(D.SPARK)).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))


def test_scattered_gate(sf_views, tmp_path):
    spark = sf_views
    df = spark.range(10)
    small = str(tmp_path / "small.parquet")
    df.write.parquet(small)
    part_file = next(
        str(p) for p in (tmp_path / "small.parquet").iterdir()
        if p.name.endswith(".parquet")
    )
    # small file: repartition applied -> plan gains an Exchange
    got = scattered(spark, spark.read.parquet(small), src_path=part_file)
    assert "Exchange" in got._jdf.queryExecution().toString()
    # "large" file: force the gate shut via the env-derived threshold
    import sentiment_analysis_data_pipeline_spark.sources.tables as T

    old = T.SCATTER_MAX_BYTES
    T.SCATTER_MAX_BYTES = 1  # everything is "large"
    try:
        base = spark.read.parquet(small)
        ungated = scattered(spark, base, src_path=part_file)
        assert ungated is base  # structurally untouched, no shuffle added
    finally:
        T.SCATTER_MAX_BYTES = old
