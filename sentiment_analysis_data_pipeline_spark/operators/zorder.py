"""Z-order (Morton) multi-dimensional layout: the file-skipping technique
for tables queried on MORE THAN ONE dimension (Delta/Iceberg expose it as
OPTIMIZE ZORDER BY).

A table laid out by one sort key skips files well for predicates on that
key and not at all for the other dimensions. Interleaving the bits of two
rank-bucketed dimensions into one Morton key and range-partitioning by it
gives every file a LOCAL 2-D tile as its min/max envelope, so parquet
row-group / file pruning works for x-only, y-only, AND box predicates --
at 100 TB the difference between scanning 1/64th and scanning everything
for the second dimension. The `zorder_stats` registry query (queries.py)
is the ADVISOR: it measures, per layout and per predicate class, how many
simulated file envelopes a range query could skip, before any rewrite is
paid for.

All arithmetic here is integer-exact (bucket = scaled integer division,
interleave = 20 div/mod terms), so both engines and the oracle agree
bit-for-bit, and the key is stable under any row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ZBITS = 10  # 10 bits per dimension -> 1024 buckets, 20-bit Morton key


def bucket_expr(col: str, lo: str, hi: str, bits: int = ZBITS) -> str:
    """Rank bucket 0..2^bits-1 of `col` within [lo, hi] -- pure integer
    scaling (no window, no sort): ((col - lo) * 2^bits) div (hi - lo + 1),
    clamped. Spark-SQL spelling; queries._zorder_stats_sql emits the same
    arithmetic through D.int_div for both dialects."""
    n = 1 << bits
    return (
        f"least({n - 1}, greatest(0, "
        f"(({col} - {lo}) * {n}) div ({hi} - {lo} + 1)))"
    )


def interleave_expr(xb: str, yb: str, bits: int = ZBITS) -> str:
    """Morton interleave of two bucket columns: bit i of x lands at 2i+1,
    bit i of y at 2i -- expressed as div/mod arithmetic (no engine bit
    operators; the dual-dialect twin lives in queries._zorder_stats_sql)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xb}) div {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({yb}) div {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame, xcol: str, ycol: str, bits: int = ZBITS
) -> DataFrame:
    """Append xb/yb bucket columns and the Morton `zkey`. Extents come from
    one min/max aggregate broadcast-joined in (two cheap map-side aggs; no
    global sort -- the reason this scales where ntile-ranking would not)."""
    ext = df.agg(
        F.min(xcol).alias("_zx_lo"),
        F.max(xcol).alias("_zx_hi"),
        F.min(ycol).alias("_zy_lo"),
        F.max(ycol).alias("_zy_hi"),
    )
    out = df.crossJoin(F.broadcast(ext))
    out = out.withColumn(
        "xb", F.expr(bucket_expr(xcol, "_zx_lo", "_zx_hi", bits)).cast("long")
    ).withColumn(
        "yb", F.expr(bucket_expr(ycol, "_zy_lo", "_zy_hi", bits)).cast("long")
    )
    out = out.withColumn("zkey", F.expr(interleave_expr("xb", "yb", bits)).cast("long"))
    return out.drop("_zx_lo", "_zx_hi", "_zy_lo", "_zy_hi")


def write_zorder(
    df: DataFrame,
    xcol: str,
    ycol: str,
    path: str,
    n_files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Write `df` z-ordered on (xcol, ycol): range-partition by the Morton
    key into n_files splits, sort within each, one file per split. Each
    file's (xcol, ycol) min/max envelope becomes a local 2-D tile, which is
    what makes parquet min/max pruning effective on BOTH columns."""
    keyed = with_zorder_key(df, xcol, ycol, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("xb", "yb", "zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_envelopes(spark, path: str, xcol: str, ycol: str) -> DataFrame:
    """Per-physical-file min/max envelope of the two layout columns -- the
    information parquet pruning consults, surfaced for audit/tests."""
    return (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            F.min(xcol).alias("x_min"),
            F.max(xcol).alias("x_max"),
            F.min(ycol).alias("y_min"),
            F.max(ycol).alias("y_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
