"""Persisted IVF-PQ index: partition-pruned code-only scans, ADC scoring
exactness vs a Python replica, and frozen-codebook appends."""

from __future__ import annotations

import glob
import math
import os
import shutil
import tempfile

from sentiment_analysis_data_pipeline_spark.operators.ann_index import _probe_cells
from sentiment_analysis_data_pipeline_spark.operators.pq_index import (
    PQ_SCALE,
    PQ_SUBDIM,
    append_to_ivfpq_index,
    build_ivfpq_index,
    ivfpq_query,
)

SF = "/root/testdata/sf0.001"


def _replica_scores(spark, idx, qvec, probes):
    """Exact replica of the ADC arithmetic over the probed cells' codes."""
    cents = {
        r["cell"]: r["cv"]
        for r in spark.read.parquet(f"{idx}/centroids.parquet").collect()
    }
    cb = {}
    for r in spark.read.parquet(f"{idx}/pq_codebook.parquet").collect():
        cb.setdefault((r["m"], r["code"]), {})[r["j"]] = r["c"]
    lut = {}
    for (m, code), js in cb.items():
        lv = 0
        for j in range(PQ_SUBDIM):
            lv += int(math.floor(qvec[m * PQ_SUBDIM + j] * js[j] * PQ_SCALE))
        lut[(m, code)] = lv
    qn = math.sqrt(sum(x * x for x in qvec))
    out = {}
    for r in spark.read.parquet(f"{idx}/codes").collect():
        if r["cell"] not in probes:
            continue
        dot = 0.0
        for a, b in zip(qvec, cents[r["cell"]]):
            dot += a * b
        qcv = int(math.floor(dot * PQ_SCALE))
        s = sum(lut[(m, int(code))] for m, code in enumerate(r["codes"]))
        nv = r["nv"]
        c = 0.0 if nv == 0.0 or qn == 0.0 else (float(qcv + s) / PQ_SCALE) / (nv * qn)
        out[r["vec_id"]] = c
    return out


def test_ivfpq_build_query_pruning_and_exactness(spark):
    idx = tempfile.mkdtemp(prefix="ivfpq-idx-")
    try:
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        build_ivfpq_index(spark, emb, idx)

        qvec = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
        out = ivfpq_query(spark, idx, qvec, k=5, n_probe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # probed cells prune at the directory level...
        assert "PartitionFilters" in plan and "cell" in plan
        # ...and the scan reads ONLY codes + norm -- never a raw vector
        # (the memory-bound claim: 8 codes + 1 norm per vector on disk)
        read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
        # carry the offending lines into the assertion message: this pin
        # flaked ONCE in a full-suite run (an extra schema string appeared
        # under accumulated session state) and was unreproducible alone --
        # if it fires again, the evidence must survive
        assert read_schemas and all(
            "codes" in l or "nv" in l for l in read_schemas
        ), read_schemas
        assert all(
            "embedding" not in l and "rv" not in l for l in read_schemas
        ), read_schemas
        assert all(
            ",v:" not in l and "<v:" not in l for l in read_schemas
        ), read_schemas

        rows = out.collect()
        assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]
        # the query vector's own id must rank FIRST with a clear margin --
        # at 64 bits/vector (16 subspaces x 4 bits) the reconstruction is
        # lossy (~0.7 self-cosine on these weakly-clustered vectors), so
        # assert the retrieval property, not near-1 reconstruction
        by_id = {r["vec_id"]: r["approx_cosine"] for r in rows}
        assert rows[0]["vec_id"] == 0
        assert by_id[0] > 0.5
        runner_up = max(v for k, v in by_id.items() if k != 0)
        assert by_id[0] > 2 * runner_up

        # scores match the Python fixed-point replica EXACTLY
        probes = set(_probe_cells(spark, idx, qvec, 2))
        want = _replica_scores(spark, idx, qvec, probes)
        top = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:5]
        assert [(r["vec_id"], r["approx_cosine"]) for r in rows] == top
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_ivfpq_append_frozen_codebooks(spark):
    idx = tempfile.mkdtemp(prefix="ivfpq-app-")
    try:
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        build_ivfpq_index(spark, emb, idx)
        files_before = set(glob.glob(f"{idx}/codes/*/*.parquet"))
        cb_mtime = max(
            os.path.getmtime(p) for p in glob.glob(f"{idx}/pq_codebook.parquet/*")
        )

        row0 = emb.where("vec_id = 0").collect()[0]
        new = spark.createDataFrame(
            [(99990, row0["label"], [float(x) for x in row0["embedding"]])],
            "vec_id long, label long, embedding array<float>",
        )
        append_to_ivfpq_index(spark, new, idx)

        # historical files untouched, codebooks frozen
        assert files_before <= set(glob.glob(f"{idx}/codes/*/*.parquet"))
        assert (
            max(os.path.getmtime(p) for p in glob.glob(f"{idx}/pq_codebook.parquet/*"))
            == cb_mtime
        )

        # the appended duplicate of vec 0 is immediately queryable and
        # scores IDENTICALLY to vec 0 (same cell, same codes, same norm)
        qvec = [float(x) for x in row0["embedding"]]
        rows = ivfpq_query(spark, idx, qvec, k=5, n_probe=2).collect()
        by_id = {r["vec_id"]: r["approx_cosine"] for r in rows}
        assert 99990 in by_id and by_id[99990] == by_id[0]
    finally:
        shutil.rmtree(idx, ignore_errors=True)
