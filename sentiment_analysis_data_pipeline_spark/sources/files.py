"""Line-oriented file formats (JSONL, CSV) beside the parquet tables.

The reference's ingestion surface is JSON over HTTP (producers/
base_producer.py fetch -> JSON article envelopes); the batch-file analog of
that feed is JSON Lines, and CSV is the interchange format everything else
exports. Both readers take an EXPLICIT schema: schema inference is a full
extra pass over the data (at 100 TB, a second 100 TB scan) and silently
widens types between runs -- a declared schema is both faster and stable.

Writers shard by the DataFrame's partitioning (one file per partition, the
normal distributed layout); `single_file=True` coalesces to one output file
for small exports only -- it serializes the write to one task by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSON Lines -> DataFrame with a declared schema. Corrupt lines land in
    no row rather than poisoning the scan (PERMISSIVE + explicit schema:
    unparseable fields are null, extra fields dropped)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """CSV -> DataFrame with a declared schema; header expected, RFC-style
    quoting (quote-doubling) so embedded commas/newlines round-trip."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """ORC -> DataFrame. Columnar like parquet (footer schema, predicate
    pushdown, column pruning all apply), so no declared schema is required;
    pass one to pin reader expectations across snapshots."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, single_file: bool = False) -> None:
    """ORC writer -- the interchange columnar format for Hive-ecosystem
    consumers (parquet stays the engine-native table format)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").orc(path)
