"""Parquet table access for the driver testdata star schema.

Replaces the reference's MongoDB scans (find/find_one/count_documents at e.g.
dags/sentiment_analysis_dag.py:36-43, dags/data_quality.py:30-32) with columnar
parquet scans: Catalyst pushes predicates into the scan and prunes columns, so
the manual projection-pushdown the reference hand-writes
(find({}, {'article.url': 1}), dags/sentiment_analysis_dag.py:37) is free.

At cluster scale the same loaders point at partitioned table roots
(partitionBy(date) -- SURVEY.md §4) instead of single files; nothing else
changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan -- no driver-side I/O."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scattered(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a low-partition-count scan across the cluster before CPU-heavy
    per-row work.

    Why: the testdata tables are single small parquet files, so the scan
    yields ONE input partition and every downstream projection runs on one
    core. At production scale tables arrive in many files/row-groups and this
    is a no-op-shaped guard; at test scale it is the difference between 1x
    and Nx cores on tokenization/hashing-bound plans. An EXPLICIT partition
    count is used because AQE's advisory coalescing would fold a few hundred
    KB right back into one partition.
    """
    # No partition-count probe: df.rdd materializes an RDD conversion that
    # costs more than the unconditional tiny-table shuffle it would avoid.
    return df.repartition(spark.sparkContext.defaultParallelism)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist a DataFrame as a bucketed (hash-clustered) parquet table --
    the co-located-join primitive.

    Two fact tables bucketed by the same key into the same bucket count join
    WITHOUT any Exchange: each task reads matching bucket files from both
    sides (sortBy additionally pre-orders rows so SortMergeJoin can skip its
    sort). At 100 TB this turns the recurring orderkey-join shuffle --
    usually the single largest wire cost in the pipeline -- into a one-time
    cost paid at ingest. tests/test_bucketed.py asserts the shuffle-free
    plan.

    An EXPLICIT location under the repo's spark-warehouse is always passed:
    a managed table would land in $PWD/spark-warehouse, and the driver's
    working directory is not guaranteed to be the repo root -- index tables
    must never write outside the repo. Bucket metadata lives in the catalog
    either way, so the co-located-join property is unchanged; overwrite
    mode replaces a stale location from a previous session cleanly."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    loc = os.path.join(repo_root, "spark-warehouse", table.lower())
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).option("path", loc)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)
