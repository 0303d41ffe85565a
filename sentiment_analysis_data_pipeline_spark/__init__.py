"""PySpark-native analytics engine with the query/data-processing surface of
the reference news-sentiment pipeline (see SURVEY.md), rebuilt Spark-first.

Layout:
    session     -- tuned local SparkSession factory
    schemas     -- typed StructType schemas for every record shape (SURVEY.md §1)
    sources     -- parquet table loaders + article-envelope adapters
    functions   -- scalar/column function library (text, sentiment, hashing, vectors)
    operators   -- composable DataFrame operators (validate, dedup, search, aggs, ...)
    plans       -- end-to-end pipelines (the flagship sentiment ETL, monitors)
    streaming   -- Structured Streaming ingest / merge sinks
"""

__version__ = "0.1.0"
