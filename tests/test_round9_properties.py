"""Property-based checks (hypothesis) for the round-9 statistical kernels:
randomized small inputs exercise the edge branches the fixed corpus never
hits (single-class histograms, all-above-mean days, tie-heavy grids).
Example counts are kept small -- every example round-trips through Spark.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sentiment_analysis_data_pipeline_spark import queries as Q
from sentiment_analysis_data_pipeline_spark.functions import dialect as D

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SET
@given(
    pts=st.lists(
        st.tuples(st.integers(1, 40), st.booleans()),  # (n_chars, is_en)
        min_size=2,
        max_size=25,
    )
)
def test_decision_stump_is_argmin_on_random_data(spark, pts):
    rows = [(i, "x" * v, "en" if y else "fr", "s", v) for i, (v, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.createOrReplaceTempView("documents")
    r = spark.sql(Q._decision_stump_sql(D.SPARK)).collect()[0]
    p = sum(y for _, y in pts)
    q = len(pts) - p
    best = None
    for t in sorted({v for v, _ in pts}):
        pl = sum(y for v, y in pts if v <= t)
        nl = sum((not y) for v, y in pts if v <= t)
        err = min(nl + p - pl, pl + q - nl)
        if best is None or err < best[0]:
            best = (err, t)
    assert (r["errors"], r["threshold"]) == best
    assert r["errors"] <= min(p, q)  # never worse than majority


@_SET
@given(
    vs=st.lists(st.integers(0, 1000), min_size=2, max_size=20),
)
def test_runs_test_on_random_series(spark, vs):
    # one synthetic purchase event per day with the chosen cent value;
    # ts is epoch-NANOS long (the engine's events encoding)
    rows = [
        (i, (i * Q.DAY_US + 1) * 1000, 1, "purchase", float(v), "{}")
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )
    df.createOrReplaceTempView("events")
    r = spark.sql(Q._runs_test_sql(D.SPARK)).collect()[0]
    cents = [int(v * 100) for v in vs]
    s, k = sum(cents), len(cents)
    sides = [1 if c * k > s else 0 for c in cents]
    runs = 1 + sum(a != b for a, b in zip(sides, sides[1:]))
    assert r["n_days"] == k
    assert r["n_above"] == sum(sides)
    assert r["n_runs"] == runs
    n1, n2 = sum(sides), k - sum(sides)
    if n1 == 0 or n2 == 0 or k <= 1 or 2 * n1 * n2 == k:
        # degenerate: one-sided series, or Var[R] exactly 0 (2*n1*n2 == n
        # -- the ANSI divide-by-zero hypothesis caught in v1)
        assert r["z"] == 0.0
    else:
        mu = 1 + 2 * n1 * n2 / k
        va = 2 * n1 * n2 * (2 * n1 * n2 - k) / (k * k * (k - 1))
        assert abs(r["z"] - (runs - mu) / va**0.5) < 1e-9


@_SET
@given(
    cells=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)),
        min_size=1,
        max_size=15,
        unique_by=lambda c: (c[0], c[1]),
    )
)
def test_kendall_tau_tail_on_random_grids(spark, cells):
    df = spark.createDataFrame(cells, "sb long, lb long, n long")
    df.createOrReplaceTempView("kt_prop_cells")
    r = spark.sql(
        Q._kendall_tau_tail(D.SPARK, "SELECT sb, lb, n FROM kt_prop_cells")
    ).collect()[0]
    conc = disc = 0
    for a1, b1, n1 in cells:
        for a2, b2, n2 in cells:
            if a2 > a1 and b2 > b1:
                conc += n1 * n2
            elif a2 > a1 and b2 < b1:
                disc += n1 * n2
    n = sum(c[2] for c in cells)
    n0 = n * (n - 1) // 2
    from collections import Counter

    ma: Counter = Counter()
    mb: Counter = Counter()
    for a1, b1, n1 in cells:
        ma[a1] += n1
        mb[b1] += n1
    ta = sum(v * (v - 1) // 2 for v in ma.values())
    tb = sum(v * (v - 1) // 2 for v in mb.values())
    assert r["concordant"] == conc and r["discordant"] == disc
    if n0 - ta <= 0 or n0 - tb <= 0:
        assert r["tau_b"] == 0.0  # fully-tied margin: guarded to 0
    else:
        tau = (conc - disc) / ((n0 - ta) * (n0 - tb)) ** 0.5
        assert abs(r["tau_b"] - tau) < 1e-12


@_SET
@given(
    en=st.lists(st.integers(1, 30), min_size=2, max_size=12),
    ot=st.lists(st.integers(1, 30), min_size=2, max_size=12),
)
def test_welch_on_random_groups_incl_constant(spark, en, ot):
    rows = [
        (i, "x" * v, lang, "s", v)
        for i, (v, lang) in enumerate(
            [(v, "en") for v in en] + [(v, "fr") for v in ot]
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.createOrReplaceTempView("documents")
    r = spark.sql(Q._welch_ttest_sql(D.SPARK)).collect()[0]
    assert (r["n_en"], r["n_other"]) == (len(en), len(ot))

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    if var(en) == 0 and var(ot) == 0:
        # both groups constant: se = 0, guarded (the ANSI throw class)
        assert r["t_stat"] == 0.0 and r["df"] == 0.0
    else:
        se2 = var(en) / len(en) + var(ot) / len(ot)
        t = (sum(en) / len(en) - sum(ot) / len(ot)) / se2**0.5
        assert abs(r["t_stat"] - t) < 1e-9


@_SET
@given(n_docs=st.integers(4, 20), const=st.integers(5, 50))
def test_permutation_test_on_constant_corpus(spark, n_docs, const):
    # every doc identical length: every replicate t is 0 (guarded), the
    # observed t is 0, and |t_b| >= |t_obs| holds for ALL replicates
    rows = [
        (i, "x" * const, "en" if i % 3 == 0 else "fr", "s", const)
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.createOrReplaceTempView("documents")
    r = spark.sql(Q._permutation_test_sql(D.SPARK)).collect()[0]
    assert r["t_obs"] == 0.0
    assert r["n_ge"] == Q.PERM_B
    assert r["p_value"] == 1.0  # no evidence against exchangeability
