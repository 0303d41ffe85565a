"""Distributed BPE merge training (Sennrich et al. 2016): learn the merge
table a byte-pair-encoding tokenizer is built from, over a word-frequency
relation.

Reference parity note: the reference pipeline pins no tokenizer trainer; this
is a north-star LLM-data-pipeline extension (tokenizer vocab construction is
the step after the `vocab_topk` counting pass).

Spark-first shape -- the iteration state is a VOCABULARY-sized table (one row
per distinct word with its corpus frequency), never the corpus itself:

- The corpus-sized work (tokenize + word count) happens ONCE, up front, as a
  map-side-combined aggregate; 100 TB of text collapses to a few million
  (word, freq) rows before any iteration starts.
- Each iteration is two vocabulary-sized jobs: (1) adjacent-pair counts via
  zip_with over shifted slices + explode + weighted sum -- partial-agg-safe;
  (2) a 1-row driver collect of the argmax pair (the same driver-sees-one-row
  pattern as dedup_clusters' convergence flag), then a greedy left-to-right
  fold applying the merge to every word's symbol sequence.
- The fold is an aggregate() higher-order function: interpreted, but it runs
  over vocab rows x ~word-length symbols -- NOT over the corpus -- so the
  interpreted cost is bounded by vocabulary size, not data size.
- State is localCheckpoint-ed each round so lineage stays O(1) across
  iterations (again the dedup_clusters pattern).

Determinism: ties in pair frequency break lexicographically on (left, right),
so the learned merge table is reproducible at any parallelism.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

END_MARK = "</w>"


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (syms: array<string>, freq): characters + end mark."""
    chars = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    return words.select(
        F.expr(f"concat({chars}, array('{END_MARK}'))").alias("syms"),
        F.col("freq"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol sequences."""
    m = "size(syms) - 1"
    pairs = f"zip_with(slice(syms, 1, {m}), slice(syms, 2, {m}), (a, b) -> struct(a, b))"
    return (
        state.where(F.expr("size(syms) >= 2"))
        .select(F.explode(F.expr(pairs)).alias("p"), F.col("freq"))
        .groupBy(F.col("p.a").alias("left"), F.col("p.b").alias("right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (left, right) -> left||right,
    as a fold: overlapping occurrences resolve leftmost-first, matching the
    reference BPE algorithm."""
    la, rb, merged = _sql_str(left), _sql_str(right), _sql_str(left + right)
    fold = f"""
        aggregate(
            syms,
            cast(array() as array<string>),
            (acc, x) -> case
                when size(acc) > 0 and element_at(acc, -1) = {la} and x = {rb}
                    then concat(slice(acc, 1, size(acc) - 1), array({merged}))
                else concat(acc, array(x))
            end
        )
    """
    return state.select(F.expr(fold).alias("syms"), F.col("freq"))


def bpe_merges(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 40,
    min_freq: int = 2,
) -> DataFrame:
    """Learn up to `n_merges` BPE merges from a (word, freq) relation.

    Returns a DataFrame (rank, left, right, merged, pair_freq) -- the merge
    table in learned order. Stops early when the best pair's weighted
    frequency drops below `min_freq`.
    """
    state = _initial_symbols(words).localCheckpoint(eager=True)
    learned: list[Row] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_freq"] < min_freq:
            break
        b = best[0]
        learned.append(
            Row(
                rank=rank,
                left=b["left"],
                right=b["right"],
                merged=b["left"] + b["right"],
                pair_freq=b["pair_freq"],
            )
        )
        state = _apply_merge(state, b["left"], b["right"]).localCheckpoint(eager=True)
    schema = "rank bigint, left string, right string, merged string, pair_freq bigint"
    return spark.createDataFrame(learned, schema)


def bpe_encode_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode ONE word with a learned merge table: apply each merge in
    RANK order, replacing adjacent (left, right) pairs greedily
    left-to-right (the original Sennrich encode; identical pair semantics
    to training's _apply_merge, so encoding the training corpus with the
    learned table reproduces the training end-state)."""
    syms = [*word] + [END_MARK]
    for left, right in merges:
        if len(syms) < 2:
            break
        acc: list[str] = []
        for x in syms:
            if acc and acc[-1] == left and x == right:
                acc[-1] = left + right
            else:
                acc.append(x)
        syms = acc
    return syms


def encode_documents(
    docs_tokens: DataFrame,
    merges: list[tuple[str, str]],
    tokens_col: str = "toks",
) -> DataFrame:
    """Apply a learned merge table to a (.., toks: array<string>) relation,
    appending `bpe_tokens` (array<string>) -- the tokenize-the-corpus step
    a training pipeline runs after vocabulary construction.

    The legitimate-UDF case (SURVEY.md §2.9 guidance): rank-ordered merge
    application is inherently sequential per word, inexpressible as
    composed relational ops -- so it runs as an Arrow-batched pandas UDF
    over the token ARRAY column. Scale shape: the merge table (tokenizer
    vocabulary, ~30k entries in production) is a broadcast-sized closure;
    per Arrow batch a word->encoding memo collapses the Zipf-heavy
    repetition, so the per-row cost approaches one dict lookup per token;
    the operator is a pure projection -- parallelizes with the scan, no
    shuffle, no state across rows."""
    from pyspark.sql.functions import pandas_udf

    frozen = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _encode(batch: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = bpe_encode_py(w, frozen)
            return got

        return batch.map(
            lambda toks: [t for w in (toks if toks is not None else []) for t in enc_word(w)]
        )

    return docs_tokens.withColumn("bpe_tokens", _encode(F.col(tokens_col)))


def bpe_merges_py(word_freqs: dict[str, int], n_merges: int = 40, min_freq: int = 2):
    """Pure-Python reference replica (for golden tests): identical greedy
    algorithm and tie-breaks."""
    state = [([*w] + [END_MARK], f) for w, f in word_freqs.items()]
    out = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in state:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_freq:
            break
        out.append((rank, left, right, left + right, freq))
        new_state = []
        for syms, f in state:
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            new_state.append((acc, f))
        state = new_state
    return out
