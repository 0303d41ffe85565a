"""Z-order layout: the advisor query's skip semantics on a deterministic
grid, and the physical writer's file envelopes (operators/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark import queries as Q
from sentiment_analysis_data_pipeline_spark.operators import zorder


def _grid_lineitem(spark, step=16):
    # full 2-D grid over [0, 1024): every x-strip holds every y value, so a
    # linear (x-sorted) layout provably cannot skip anything for y-only
    xs = list(range(0, 1024, step))
    rows = [(x, y) for x in xs for y in xs]
    spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long"
    ).createOrReplaceTempView("lineitem")


def test_zorder_stats_grid_semantics(spark):
    _grid_lineitem(spark)
    out = {(r["layout"], r["pred"]): r for r in
           spark.sql(Q._zorder_stats_sql(Q.D.SPARK)).collect()}
    assert len(out) == 6
    # linear: strong on its own key, BLIND on the other dimension
    assert out[("linear", "x_only")]["n_skipped"] >= 48
    assert out[("linear", "y_only")]["n_skipped"] == 0
    # z-order: symmetric pruning on both single-dimension bands, and the
    # 2-D box prunes at least as well as either band alone
    zx = out[("zorder", "x_only")]["n_skipped"]
    zy = out[("zorder", "y_only")]["n_skipped"]
    assert zx >= 32 and zy >= 32
    assert out[("zorder", "xy_box")]["n_skipped"] >= max(zx, zy)
    for r in out.values():
        assert r["n_files"] >= 1 and 0.0 <= r["skip_rate"] <= 1.0
        assert r["n_skipped"] <= r["n_files"]


def test_morton_key_matches_python_replica(spark):
    # the 20-term div/mod interleave == a bit-twiddling Python replica
    rows = [(x, y) for x in (0, 1, 5, 511, 1023) for y in (0, 2, 7, 640, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.selectExpr(
            "x", "y", zorder.interleave_expr("x", "y") + " AS z"
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_write_zorder_file_envelopes_tile_both_dims(spark, tmp_path):
    xs = list(range(0, 1024, 32))
    rows = [(x, y, x * 1024 + y) for x in xs for y in xs]
    df = spark.createDataFrame(rows, "a long, b long, payload long")

    zpath = str(tmp_path / "zordered")
    zorder.write_zorder(df, "a", "b", zpath, n_files=8)
    env = zorder.file_envelopes(spark, zpath, "a", "b").collect()
    assert sum(r["n_rows"] for r in env) == len(rows)
    assert len(env) >= 4  # range partitioner may merge a couple of splits
    # every file's envelope is a LOCAL tile: neither dimension spans the
    # full [0, 992] range everywhere (linear layout would pin b to 992)
    global_span = 992
    assert all(r["x_max"] - r["x_min"] < global_span for r in env)
    assert all(r["y_max"] - r["y_min"] < global_span for r in env)

    # the linear twin: partition by `a` only -> every file's b-envelope is
    # the full range (each a-strip carries all b values)
    lpath = str(tmp_path / "linear")
    (
        df.repartitionByRange(8, "a").sortWithinPartitions("a")
        .write.mode("overwrite").parquet(lpath)
    )
    lenv = zorder.file_envelopes(spark, lpath, "a", "b").collect()
    assert all(r["y_max"] - r["y_min"] == global_span for r in lenv)


def test_zorder_scan_prunes_rowgroups(spark, tmp_path):
    # end-to-end: a b-only predicate over the z-ordered table scans fewer
    # rows than the linear table under parquet min/max pruning. Compare via
    # the number of FILES whose envelope intersects the predicate (the
    # pruning parquet actually performs per file/row-group).
    xs = list(range(0, 1024, 32))
    rows = [(x, y, 1) for x in xs for y in xs]
    df = spark.createDataFrame(rows, "a long, b long, v long")
    zpath = str(tmp_path / "z2")
    zorder.write_zorder(df, "a", "b", zpath, n_files=8)
    env = zorder.file_envelopes(spark, zpath, "a", "b").collect()
    # with 8 Morton ranges the y tiling is coarse (halves); use a band in
    # the LOW y half [0, 127] -- every file tiling the high-y half-space is
    # prunable, which a linear-by-a layout can never offer
    touched = [r for r in env if r["y_min"] <= 127]
    assert len(touched) < len(env)
    # correctness of the pruned scan is unchanged
    n = spark.read.parquet(zpath).filter(F.col("b") <= 127).count()
    assert n == sum(1 for _x, y, _v in rows if y <= 127)
