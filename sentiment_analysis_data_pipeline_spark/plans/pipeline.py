"""The flagship pipeline: the reference's hourly sentiment ETL (EP3,
SURVEY.md §3) as ONE Spark logical plan.

Reference shape (dags/sentiment_analysis_dag.py): three Airflow tasks --
extract (Mongo scan + Python-set anti-join, :31-49) -> analyze (per-row
VADER/TextBlob loop, :54-99) -> save (per-row insert + ES index, :101-130) --
with full-list XCom serialization between each. Here the same semantics are a
single DataFrame lineage: scan -> validate -> anti-join -> kernel ->
classify -> aggregate/write; Catalyst fuses the projections and pushes the
filters into the parquet scan, and there is no serialization boundary at all.

The driver's `documents` table stands in for the article corpus (FIXTURES.md
§B mapping): text = article body, a deterministic synthetic URL per doc
exercises the URL-validation/id-hash path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dialect as D
from ..functions import sentiment as S
from ..functions import text as TX
from ..operators import validate
from ..operators.aggregates import terms_agg

# Deterministic synthetic URL so P1/P2/F3 run on the documents corpus.
DOC_URL_SQL = {
    D.SPARK: "concat('https://', source, '.example.com/', cast(doc_id as string))",
    D.DUCKDB: "concat('https://', source, '.example.com/', cast(doc_id as varchar))",
}


def documents_as_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the documents table to the article-envelope surface (P10 analog):
    doc_id, url, title (leading slice), text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(DOC_URL_SQL[D.SPARK]).alias("url"),
        F.expr("substring(coalesce(text, ''), 1, 64)").alias("title"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "source",
        "lang",
        "n_chars",
    )


def sentiment_enrich(df: DataFrame, text_expr: str = "text") -> DataFrame:
    """U1+U2+F8-F11: append the sentiment columns, all native expressions.

    Layered selects keep each score computed once (vs naive re-inlining);
    Catalyst collapses the projections into a single codegen stage.
    """
    # tokenize once, reuse for both analyzers
    step1 = df.withColumn("_toks", F.expr(TX.tokenize(D.SPARK, text_expr)))
    step2 = step1.withColumn(
        "vader_compound", F.expr(S.vader_compound(D.SPARK, "_toks"))
    ).withColumn("textblob_polarity", F.expr(S.textblob_polarity(D.SPARK, "_toks")))
    step3 = step2.withColumn("avg_score", F.expr(S.avg_score()))
    return (
        step3.withColumn("overall", F.expr(S.classify("avg_score")))
        .withColumn("confidence", F.expr(S.confidence("avg_score")))
        .drop("_toks")
    )


def processed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validated + scored corpus with the PROCESSED shape's sentiment struct
    (F11) and md5 surrogate id (F3)."""
    articles = documents_as_articles(spark, sf_dir)
    valid = articles.filter(
        validate.non_empty_text(F.col("text")) & validate.valid_url(F.col("url"))
    )
    scored = sentiment_enrich(valid)
    return scored.select(
        F.md5("url").alias("doc_id_hash"),
        "doc_id",
        "url",
        "title",
        "text",
        F.struct(
            F.col("overall"),
            F.col("confidence"),
            F.col("vader_compound"),
            F.col("textblob_polarity"),
        ).alias("sentiment"),
    )


def flagship_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 end-to-end, returning the sentiment-distribution terms agg (A4)."""
    return terms_agg(processed_docs(spark, sf_dir), "sentiment.overall")
