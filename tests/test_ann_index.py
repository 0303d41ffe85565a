"""Persisted IVF index: partition-pruned probes + exactness within the
probed cells."""

from __future__ import annotations

import math
import shutil
import tempfile

from sentiment_analysis_data_pipeline_spark.operators.ann_index import (
    _probe_cells,
    build_ivf_index,
    ivf_query,
)

SF = "/root/testdata/sf0.001"


def test_ivf_index_build_query_and_pruning(spark):
    idx = tempfile.mkdtemp(prefix="ivf-idx-")
    try:
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        build_ivf_index(spark, emb, idx)

        qvec = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
        out = ivf_query(spark, idx, qvec, k=5, n_probe=2)

        # the probe filter reaches the scan as a PARTITION filter (pruned
        # directories), not a post-scan predicate
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan

        rows = out.collect()
        assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]
        assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] > 0.999

        # exact within the probed cells: replicate brute-force in python
        probes = set(_probe_cells(spark, idx, qvec, 2))
        assign = spark.read.parquet(f"{idx}/assignments").collect()
        qn = math.sqrt(sum(x * x for x in qvec))
        scored = []
        for r in assign:
            if r["cell"] not in probes:
                continue
            cn = r["nv"]
            cos = 0.0 if cn == 0.0 or qn == 0.0 else sum(a * b for a, b in zip(r["v"], qvec)) / (cn * qn)
            scored.append((cos, r["vec_id"]))
        scored.sort(key=lambda t: (-t[0], t[1]))
        want = [vid for _, vid in scored[:5]]
        assert [r["vec_id"] for r in rows] == want
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_ivf_index_incremental_append(spark):
    """append_to_ivf_index: a new vector lands in the right cell partition,
    becomes queryable immediately, and the query still partition-prunes --
    the corpus side is never rewritten."""
    import glob
    import os

    from sentiment_analysis_data_pipeline_spark.operators.ann_index import (
        append_to_ivf_index,
    )

    idx = tempfile.mkdtemp(prefix="ivf-idx-app-")
    try:
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        build_ivf_index(spark, emb, idx)
        files_before = set(glob.glob(f"{idx}/assignments/cell=*/*.parquet"))

        # new vector = a near-copy of vec 0 (same cell, cosine ~1)
        base = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
        near = [x * 1.01 for x in base]
        new = spark.createDataFrame(
            [(900001, near, None)], "vec_id long, embedding array<float>, label int"
        )
        append_to_ivf_index(spark, new, idx)

        # the append only ADDED files -- nothing the build wrote was touched
        files_after = set(glob.glob(f"{idx}/assignments/cell=*/*.parquet"))
        assert files_before < files_after
        for f in files_before:
            assert os.path.exists(f)

        out = ivf_query(spark, idx, base, k=3, n_probe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan
        top = out.collect()
        ids = [r["vec_id"] for r in top]
        assert 900001 in ids and 0 in ids  # appended vector is queryable
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_streaming_vector_ingest(spark, tmp_path):
    """Two streamed batches grow the index in place; a replayed vec_id is
    anti-joined out; the new vectors are immediately queryable."""
    import json

    from sentiment_analysis_data_pipeline_spark.streaming.ann_stream import (
        run_streaming_vector_ingest,
    )

    idx = str(tmp_path / "ivf")
    src = tmp_path / "vecs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_index(spark, emb, idx)
    base = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]

    def drop(name, rows):
        with open(str(src / name), "w") as f:
            for vid, vec in rows:
                f.write(json.dumps({"vec_id": vid, "embedding": vec, "label": 0}) + "\n")

    drop("b1.json", [(900002, [x * 1.02 for x in base]), (0, base)])  # 0 = re-ingest
    run_streaming_vector_ingest(spark, str(src), idx, ckpt).awaitTermination(120)
    drop("b2.json", [(900003, [x * 1.03 for x in base])])
    run_streaming_vector_ingest(spark, str(src), idx, ckpt).awaitTermination(120)

    assign = spark.read.parquet(f"{idx}/assignments")
    assert assign.filter("vec_id = 0").count() == 1  # re-ingest dropped
    assert assign.filter("vec_id >= 900002").count() == 2

    ids = [r["vec_id"] for r in ivf_query(spark, idx, base, k=4, n_probe=2).collect()]
    assert 900002 in ids and 900003 in ids and 0 in ids
