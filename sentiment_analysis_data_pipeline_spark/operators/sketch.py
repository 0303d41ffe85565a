"""Count-Min sketch cells as a DataFrame operator (Cormode &
Muthukrishnan 2005) -- the mergeable bounded-state frequency structure
shared by the batch audit query (`countmin_heavy_hitters` in queries.py)
and the streaming accumulator (streaming/sketch_stream.py).

The sketch is a {CM_DEPTH} x {CM_WIDTH} grid of counters; cell (j, c)
holds the number of token occurrences whose j-th hash lands on column c.
Hash family: Kirsch-Mitzenmacher double hashing over the token md5
(g_j(x) = h1(x) + j*h2(x), the construction the MinHash signatures use),
so the structure is fully deterministic -- a DuckDB oracle or a replayed
stream rebuilds it bit-for-bit.

Why this is the 100 TB shape: a sketch PARTIAL is itself a sketch, and
partials merge by cell-wise sum. The groupBy below therefore map-side
combines each partition's token stream into <= CM_DEPTH*CM_WIDTH rows
before any shuffle, the batch audit merges partials the same way, and the
streaming twin appends one <= CM_DEPTH*CM_WIDTH-row partial per
micro-batch and merges lazily at read -- frequency state that never grows
with the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dialect as D
from ..functions import hashing as H
from ..functions import text as TX

CM_DEPTH = 4  # sketch rows (independent hash functions)
CM_WIDTH = 512  # sketch columns per row
CM_TOP = 20  # heavy hitters the batch audit reads back


def countmin_cells(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(j, col, cnt) sketch cells for the token stream of `docs` --
    at most CM_DEPTH * CM_WIDTH rows regardless of input size. Works on
    any batch DataFrame; the streaming twin applies it per micro-batch
    inside foreachBatch."""
    toks = TX.tokenize(D.SPARK, f"coalesce({text_col}, '')")
    h1 = H.hex_to_bigint(D.SPARK, "th", 14)
    h2 = H.hex_to_bigint(D.SPARK, "substring(th, 15, 14)", 14)
    return (
        docs.selectExpr(f"{toks} AS toks")
        .selectExpr("explode(toks) AS t")
        .selectExpr("md5(t) AS th")
        .selectExpr(f"({h1}) AS h1", f"({h2}) AS h2")
        .selectExpr("h1", "h2", f"explode(sequence(0, {CM_DEPTH - 1})) AS j")
        .selectExpr("j", f"(h1 + j * h2) % {CM_WIDTH} AS col")
        .groupBy("j", "col")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def estimate_counts(cells: DataFrame, tokens: DataFrame) -> DataFrame:
    """Point-query the sketch: for each row of `tokens(token)` return
    (token, cm_estimate) = min over the CM_DEPTH rows of the addressed
    cell, with an ABSENT cell counting as 0 (the CM definition: a counter
    never incremented is zero). Implemented as an explicit per-(token, j)
    probe relation LEFT-joined to the cells -- the earlier inner join
    dropped empty-cell hash rows from the min (an estimate looser than
    CM's) and lost all-cells-empty tokens from the output entirely
    (round-8 ADVICE fix). `cells` may be partial-merged already or raw
    partials -- the lookup sums duplicates per (j, col) first, so both
    work."""
    merged = cells.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))
    h1 = H.hex_to_bigint(D.SPARK, "th", 14)
    h2 = H.hex_to_bigint(D.SPARK, "substring(th, 15, 14)", 14)
    probes = (
        tokens.selectExpr("token", "md5(token) AS th")
        .selectExpr("token", f"({h1}) AS h1", f"({h2}) AS h2")
        .selectExpr("token", f"explode(sequence(0, {CM_DEPTH - 1})) AS j", "h1", "h2")
        .selectExpr("token", "j", f"(h1 + j * h2) % {CM_WIDTH} AS col")
    )
    return (
        probes.join(F.broadcast(merged), ["j", "col"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .groupBy("token")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


# --------------------------------------------------------------- HDR hist
# The quantile member of the mergeable-sketch trio (HLL = distinct,
# Count-Min = frequency, this = quantiles): HdrHistogram's log-linear
# binning (Gil Tene, hdrhistogram.org) over non-negative integer values.
# Values below 2^HDR_SUB_BITS get exact unit buckets; above, each power-of-2
# range splits into 2^HDR_SUB_BITS sub-buckets, so the bucket LOWER BOUND
# under-estimates any member by at most a factor 2^-HDR_SUB_BITS (6.25%
# relative error at 4 bits) while total state stays <= ~16 * 60 rows per
# segment REGARDLESS of value cardinality. Fully deterministic integer
# arithmetic -- a DuckDB oracle or a replayed stream rebuilds it
# bit-for-bit (the countmin_cells property, for quantiles).

HDR_SUB_BITS = 4
HDR_SUB = 1 << HDR_SUB_BITS


def hdr_index_sql(v: str) -> str:
    """Bucket index of a non-negative BIGINT expression. Identical SQL text
    in both dialects (bin/length/greatest/>> agree): msb via the binary
    string length, shift = max(msb - sub_bits, 0), index = shift * 2^s +
    (v >> shift). Linear region (v < 2^s) falls out of the same formula
    with shift = 0."""
    msb = f"(length(bin({v})) - 1)"
    shift = f"greatest({msb} - {HDR_SUB_BITS}, 0)"
    return f"({shift} * {HDR_SUB} + ({v} >> {shift}))"


def hdr_lower_sql(idx: str) -> str:
    """Inverse: the smallest value mapping to bucket `idx` -- the
    deterministic quantile answer the histogram serves."""
    shift = f"greatest(({idx} >> {HDR_SUB_BITS}) - 1, 0)"
    return f"(({idx} - {shift} * {HDR_SUB}) << {shift})"


def hdr_cells(
    events: DataFrame, segment_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """(segment, idx, cnt) histogram cells for `events` -- bounded rows per
    segment regardless of input size; doubles enter as exact floor-cents
    (one IEEE multiply both engines share), negatives/nulls clamp to the
    zero bucket. A partial IS a histogram: partials merge by (segment, idx)
    sum, which is what the streaming twin's read side does."""
    v = f"cast(floor(greatest(coalesce({value_col}, 0), 0) * 100) as bigint)"
    return (
        events.selectExpr(f"{segment_col} AS segment", f"{v} AS v")
        .selectExpr("segment", f"{hdr_index_sql('v')} AS idx")
        .groupBy("segment", "idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


# ------------------------------------------------------------ ES reservoir
# Efraimidis-Spirakis weighted-sampling keys (2006): item with weight w
# draws u in (0,1] and the k smallest -ln(u)/w keys ARE a weighted sample
# without replacement. The key set is MERGEABLE exactly like a sketch --
# the k smallest keys of a union of partials equal the k smallest over the
# union -- which is what makes both the distributed batch top-k and the
# streaming reservoir below correct. Shared by queries.weighted_sample and
# streaming/reservoir_stream.py so the two paths cannot drift.

ES_SCALE = 1073741824.0  # 2^30 floor quantization after the one ln
ES_U_DEN = 72057594037927936.0  # 2^56: u = (h1+1)/2^56, an exact dyadic


def es_key_sql(d: str, kh_col: str, weight_expr: str) -> str:
    """Floor-quantized ES key: floor(-ln(u)/w * 2^30) as BIGINT, with u
    derived from a PRECOMPUTED md5-hex column (callers materialize
    md5(id) in a subquery once -- inlining it here would recompute the
    md5 for each of the 14 hex-digit extractions inside hex_to_bigint).
    Deterministic, cross-engine (the char_entropy ln-then-floor
    precedent). Smaller key = more likely sampled."""
    h1 = H.hex_to_bigint(d, kh_col, 14)
    return (
        f"cast(floor((-ln((cast({h1} as double) + 1.0) / {ES_U_DEN!r}))"
        f" / cast({weight_expr} as double) * {ES_SCALE!r}) as bigint)"
    )
