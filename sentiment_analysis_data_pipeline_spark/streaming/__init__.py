from .ingest import (
    file_article_stream,
    kafka_article_stream,
    kafka_envelope_sink_options,
    merge_into_parquet,
    run_file_ingest,
    windowed_freshness,
)

__all__ = [
    "file_article_stream",
    "kafka_article_stream",
    "kafka_envelope_sink_options",
    "merge_into_parquet",
    "run_file_ingest",
    "windowed_freshness",
]
