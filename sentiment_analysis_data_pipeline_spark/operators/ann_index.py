"""Persisted IVF ANN index: build once, query many.

The registry's `ivf_ann` demonstrates the IVF *plan* end-to-end in one
statement; production ANN at 100 TB never rebuilds the codebook per query.
This module persists the two IVF relations the way a deployment would:

- `centroids.parquet` -- the codebook: tiny (nlist rows), broadcast/collected
  at query time.
- `assignments/` -- (vec_id, v, nv, cell), **written partitionBy(cell)**: a
  multi-probe query filters `cell IN (probes)` and the scan PRUNES to the
  probed cells' directories -- the inverted-file property expressed directly
  in the storage layout, so each query reads ~n_probe/nlist of the corpus
  (asserted against PartitionFilters in tests/test_ann_index.py).

Centroids are the label-column means (the same deterministic floor-quantized
exact codebook as `ivf_ann` -- a k-means stand-in whose cells are reproducible at
any parallelism); per-vector norms are computed once at BUILD time and
stored, so queries never touch raw-vector math beyond one dot per candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dialect as D
from ..functions import vectors as V

EMB_DIM = 64


def write_centroids(spark: SparkSession, emb: DataFrame, index_dir: str) -> None:
    """Write the coarse codebook (`centroids.parquet`, nlist rows) for an
    embeddings DataFrame (vec_id, label, embedding array<float>) -- shared
    by the IVF build and the IVF-PQ build (pq_index.py)."""
    emb.createOrReplaceTempView("_ivf_build_emb")
    v = V.to_double_array(D.SPARK, "embedding")
    cent = spark.sql(
        f"""
        WITH emb AS (SELECT vec_id, label, {v} AS v FROM _ivf_build_emb),
        ex AS (SELECT label, posexplode(v) AS (idx, x) FROM emb),
        cent AS (
            SELECT label, idx,
                   cast(cast(sum(cast(floor(x * 1000000000.0) as decimal(38,0))) as double) / (count(*) * 1000000000.0) as double) AS c
            FROM ex GROUP BY label, idx
        )
        SELECT label AS cell,
               transform(array_sort(collect_list(struct(idx, c))), s -> s.c) AS cv
        FROM cent GROUP BY label
        """
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids.parquet")


def build_ivf_index(spark: SparkSession, emb: DataFrame, index_dir: str) -> None:
    """Build the persisted index from an embeddings DataFrame
    (vec_id, label, embedding array<float>)."""
    write_centroids(spark, emb, index_dir)
    assign = _assign_to_cells(spark, index_dir, "_ivf_build_emb")
    assign.write.mode("overwrite").partitionBy("cell").parquet(f"{index_dir}/assignments")


def _assign_to_cells(spark: SparkSession, index_dir: str, emb_view: str) -> DataFrame:
    """(vec_id, v, nv, cell) nearest-centroid assignment of an embeddings
    view against the persisted codebook (broadcast cross join: nlist rows)."""
    v = V.to_double_array(D.SPARK, "embedding")
    nv = V.norm(D.SPARK, "v", EMB_DIM)
    ncv = V.norm(D.SPARK, "cv", EMB_DIM)
    dot = V.dot(D.SPARK, "e.v", "c.cv", EMB_DIM)
    spark.read.parquet(f"{index_dir}/centroids.parquet").createOrReplaceTempView("_ivf_cent")
    return spark.sql(
        f"""
        WITH emb0 AS (SELECT vec_id, {v} AS v FROM {emb_view}),
        emb AS (SELECT vec_id, v, {nv} AS nv FROM emb0),
        cent AS (SELECT cell, cv, {ncv} AS ncv FROM _ivf_cent),
        assign0 AS (
            SELECT e.vec_id, e.v, e.nv, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY (case when e.nv = 0.0 or c.ncv = 0.0 then 0.0
                                                else {dot} / (e.nv * c.ncv) end) DESC,
                                      c.cell ASC) AS rn
            FROM emb e CROSS JOIN cent c
        )
        SELECT vec_id, v, nv, cell FROM assign0 WHERE rn = 1
        """
    )


def append_to_ivf_index(spark: SparkSession, new_emb: DataFrame, index_dir: str) -> None:
    """Incremental vector ingest -- the ANN twin of the incremental-dedup
    workflow: NEW vectors are assigned against the EXISTING codebook
    (broadcast, nlist rows) and appended into their cells' partition
    directories. The historical corpus is never re-read, re-assigned, or
    re-shuffled; partition pruning at query time is unchanged because the
    new files land inside the same cell=... directories.

    The codebook is intentionally frozen (standard IVF practice -- FAISS
    `add` after `train`): drift is handled by periodic re-training as a
    separate snapshot build, not per-append. Appended vec_ids are the
    caller's responsibility to keep unique (upstream exact/near dedup)."""
    new_emb.createOrReplaceTempView("_ivf_append_emb")
    assign = _assign_to_cells(spark, index_dir, "_ivf_append_emb")
    assign.write.mode("append").partitionBy("cell").parquet(f"{index_dir}/assignments")


def _probe_cells(spark: SparkSession, index_dir: str, query_vec: list[float], n_probe: int) -> list[str]:
    """Rank cells by centroid cosine against the query -- the codebook is
    nlist rows, so this is a driver-side computation over a tiny collect."""
    import math

    cents = spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    qn = math.sqrt(sum(x * x for x in query_vec))
    scored = []
    for r in cents:
        cv = r["cv"]
        cn = math.sqrt(sum(x * x for x in cv))
        cos = 0.0 if qn == 0.0 or cn == 0.0 else sum(a * b for a, b in zip(query_vec, cv)) / (qn * cn)
        scored.append((cos, r["cell"]))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [cell for _, cell in scored[:n_probe]]


def ivf_query(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """Top-k cosine neighbors from the persisted index. The assignments scan
    carries `cell IN (probes)` as a PARTITION filter -- only the probed
    directories are read."""
    probes = _probe_cells(spark, index_dir, query_vec, n_probe)
    assign = spark.read.parquet(f"{index_dir}/assignments").where(F.col("cell").isin(probes))
    assign.createOrReplaceTempView("_ivf_probe")
    qlit = "array(" + ", ".join(repr(float(x)) for x in query_vec) + ")"
    dot = V.dot(D.SPARK, "a.v", "q.qv", EMB_DIM)
    return spark.sql(
        f"""
        WITH q AS (SELECT {qlit} AS qv),
        qn AS (SELECT qv, {V.norm(D.SPARK, "qv", EMB_DIM)} AS qnv FROM q),
        cand AS (
            SELECT a.vec_id,
                   (case when a.nv = 0.0 or q.qnv = 0.0 then 0.0
                         else {dot} / (a.nv * q.qnv) end) AS cosine
            FROM _ivf_probe a CROSS JOIN qn q
        )
        SELECT vec_id, cosine,
               cast(row_number() OVER (ORDER BY cosine DESC, vec_id ASC) as bigint) AS rnk
        FROM cand ORDER BY rnk LIMIT {k}
        """
    )
