from .ingest import (
    file_article_stream,
    kafka_article_stream,
    kafka_envelope_sink_options,
    enrich_with_dim,
    hopping_activity,
    merge_into_parquet,
    run_file_ingest,
    run_sentiment_stream,
    split_valid_corrupt,
    sessionized_activity,
    windowed_freshness,
    with_stream_dedup,
)

__all__ = [
    "file_article_stream",
    "kafka_article_stream",
    "kafka_envelope_sink_options",
    "enrich_with_dim",
    "hopping_activity",
    "merge_into_parquet",
    "run_file_ingest",
    "run_sentiment_stream",
    "split_valid_corrupt",
    "sessionized_activity",
    "windowed_freshness",
    "with_stream_dedup",
]
