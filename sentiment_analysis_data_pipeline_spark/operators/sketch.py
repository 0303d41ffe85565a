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
    cell. `cells` may be partial-merged already or raw partials -- the
    lookup sums duplicates per (j, col) first, so both work."""
    merged = cells.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))
    h1 = H.hex_to_bigint(D.SPARK, "th", 14)
    h2 = H.hex_to_bigint(D.SPARK, "substring(th, 15, 14)", 14)
    keyed = tokens.selectExpr("token", "md5(token) AS th").selectExpr(
        "token", f"({h1}) AS h1", f"({h2}) AS h2"
    )
    return (
        keyed.join(
            F.broadcast(merged),
            F.expr(f"col = (h1 + j * h2) % {CM_WIDTH}"),
        )
        .groupBy("token")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
