"""Search surface: the ES query DSL re-expressed as DataFrame plans
(SURVEY.md §2.8).

  Q2 term query + sort desc + limit   database/elasticsearch_handler.py:64-69
  Q3 multi_match keyword search       database/elasticsearch_handler.py:71-80
  Q4/A4 terms agg                     database/elasticsearch_handler.py:82-93

Q3: no inverted index in Spark -- the engine tokenizes once into a
`tokens` array column (analyzer parity: lowercase + stopword removal +
suffix-strip stemming, configs/elasticsearch_config.py:94-112) and scores
relevance as
|query_terms ∩ tokens| (the reference never reads ES _score, so overlap
count is a faithful, deterministic stand-in). sort+limit compiles to
TakeOrderedAndProject: top-k per partition then a k-row merge at the driver,
no global sort -- the at-scale win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dialect as D
from ..functions import text


def with_tokens(df: DataFrame, content_col: str, out_col: str = "tokens") -> DataFrame:
    """Materialize the analyzed-token column (do this once at ingest; at scale
    it's written to the table so queries never re-tokenize)."""
    return df.withColumn(out_col, F.expr(text.analyzed_tokens(D.SPARK, content_col)))


def term_query(df: DataFrame, field: str, value: str, sort_col: str, tiebreak: str, size: int = 50) -> DataFrame:
    """Q2: exact-term filter + deterministic sort desc + limit."""
    return (
        df.filter(F.col(field) == value)
        .orderBy(F.col(sort_col).desc(), F.col(tiebreak).asc())
        .limit(size)
    )


def keyword_search(
    df: DataFrame,
    query: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    size: int = 50,
) -> DataFrame:
    """Q3: analyzed keyword search with overlap relevance.

    The query string goes through the same analyzer as documents; a doc
    matches if any query term appears in its token array. Score =
    |distinct query terms present|; ties broken by id for determinism.
    """
    q_terms = sorted(set(_analyze_py(query)))
    if not q_terms:
        return df.select(F.col(id_col).alias("doc"), F.lit(0).alias("score")).limit(0)
    terms_arr = F.array(*[F.lit(t) for t in q_terms])
    tokens = F.expr(text.analyzed_tokens(D.SPARK, content_col))
    return (
        df.select(F.col(id_col).alias("doc"), tokens.alias("_toks"))
        .withColumn("score", F.size(F.array_intersect(F.array_distinct("_toks"), terms_arr)))
        .filter(F.col("score") > 0)
        .select("doc", "score")
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(size)
    )


def _analyze_py(s: str) -> list[str]:
    """Driver-side copy of the analyzer for the (tiny) query string:
    lowercase + stopword removal + the same stem chain documents get."""
    import re

    cleaned = re.sub(r"[^a-z0-9 ]", " ", s.strip().lower())
    return [
        text.stem_py(t) for t in cleaned.split() if t and t not in set(text.STOPWORDS)
    ]
