"""Semantic tests for the PQ (product quantization) ANN family: a pure-
Python replica of the full train -> encode -> ADC pipeline asserting EXACT
equality with the Spark output (the BPE-golden pattern), plus crisp
degenerate-corpus invariants for the distortion QA. Oracle parity is
covered by tools/selfcheck.py; these pin the *meaning*."""

from __future__ import annotations

import math

import pytest

from sentiment_analysis_data_pipeline_spark import queries as Q

M, SUB, K, SCALE = Q.PQ_M, Q.PQ_SUBDIM, Q.PQ_K, Q.PQ_SCALE
DIM = Q.EMB_DIM


def _emb_view(spark, vecs):
    """vecs: {vec_id: [64 floats]} -> embeddings(vec_id, label, embedding).
    Values must be exactly representable in float32 (quarters etc.) so the
    Python replica can reuse them verbatim."""
    rows = [(int(i), int(i) % 3, [float(x) for x in v]) for i, v in vecs.items()]
    spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    ).createOrReplaceTempView("embeddings")


def _group(v, m):
    """Sign-orthant training group: sign bits of the subspace's first 4
    components (matches PQ_SIGN_BITS in queries.py)."""
    return sum(1 << j for j in range(4) if v[m * SUB + j] > 0)


def _replica(vecs):
    """Exact replica of _pq_cent_sql + _pq_body + _pq_ann_sql arithmetic."""
    # codebook: per (m, code, j) floor-quantized mean over the group
    sums: dict[tuple[int, int, int], int] = {}
    counts: dict[tuple[int, int], int] = {}
    for vid, v in vecs.items():
        for m in range(M):
            g = _group(v, m)
            counts[(m, g)] = counts.get((m, g), 0) + 1
            for j in range(SUB):
                x = v[m * SUB + j]
                key = (m, g, j)
                sums[key] = sums.get(key, 0) + math.floor(x * 1000000000.0)
    cent: dict[tuple[int, int, int], float] = {}
    for (m, g, j), s in sums.items():
        cent[(m, g, j)] = float(s) / (counts[(m, g)] * 1000000000.0)
    codes_present = sorted({(m, g) for (m, g) in counts})
    # encode: per (vec, m) min (qdist, code)
    enc: dict[tuple[int, int], int] = {}
    qdists: dict[tuple[int, int], int] = {}
    for vid, v in vecs.items():
        for m in range(M):
            best = None
            for (mm, code) in codes_present:
                if mm != m:
                    continue
                qd = 0
                for j in range(SUB):
                    d = v[m * SUB + j] - cent[(m, code, j)]
                    qd += math.floor(d * d * SCALE)
                if best is None or (qd, code) < best:
                    best = (qd, code)
            enc[(vid, m)] = best[1]
            qdists[(vid, m)] = best[0]
    # norms: left-associated fold, identical order to V.norm's expansion
    def norm(v):
        s = 0.0
        for i in range(DIM):
            s = s + v[i] * v[i]
        return math.sqrt(s)

    nv = {vid: norm(v) for vid, v in vecs.items()}
    # ADC
    out = []
    for qid in sorted(vecs):
        if qid >= Q.PQ_NQ:
            continue
        qv = vecs[qid]
        lut: dict[tuple[int, int], int] = {}
        for (m, code) in codes_present:
            lv = 0
            for j in range(SUB):
                lv += math.floor(qv[m * SUB + j] * cent[(m, code, j)] * SCALE)
            lut[(m, code)] = lv
        scored = []
        for vid in vecs:
            if vid == qid:
                continue
            s = sum(lut[(m, enc[(vid, m)])] for m in range(M))
            if nv[vid] == 0.0 or nv[qid] == 0.0:
                c = 0.0
            else:
                c = (float(s) / SCALE) / (nv[vid] * nv[qid])
            scored.append((-c, vid, c))
        scored.sort()
        for rnk, (_, vid, c) in enumerate(scored[: Q.PQ_TOPK], start=1):
            out.append((qid, vid, c, rnk))
    return out, enc, qdists


def _mini_corpus(n=12):
    """float32-exact values (multiples of 0.25), deterministic, spread."""
    vecs = {}
    for i in range(n):
        vecs[i] = [((i * 7 + d * 3) % 23 - 11) * 0.25 for d in range(DIM)]
    return vecs


def test_pq_ann_matches_python_replica_exactly(spark):
    vecs = _mini_corpus()
    _emb_view(spark, vecs)
    df = spark.sql(Q._pq_ann_sql(Q.D.SPARK))
    got = sorted(
        (r["q_id"], r["vec_id"], r["approx_cosine"], r["rnk"]) for r in df.collect()
    )
    want, _, _ = _replica(vecs)
    assert got == sorted(want)  # exact float equality, not approx


def test_pq_identical_vectors_get_identical_codes(spark):
    vecs = _mini_corpus()
    vecs[20] = list(vecs[7])  # exact duplicate of vec 7 under a new id
    _emb_view(spark, vecs)
    enc = {
        (r["vec_id"], r["m"]): r["code"]
        for r in spark.sql(
            Q._pq_body(
                Q.D.SPARK, Q._pq_cent_sql(Q.D.SPARK), "\nSELECT vec_id, m, code FROM enc"
            )
        ).collect()
    }
    # same subvectors -> same quantized distances -> same argmin codes
    for m in range(M):
        assert enc[(20, m)] == enc[(7, m)]


def test_pq_distortion_degenerate_corpus(spark):
    # all vectors identical: every group centroid equals the vector, all
    # quantized distances are 0, ties resolve to the lowest present code
    # -> one code used per subspace, share 1.0, mean_qerr exactly 0.0
    v = [0.5] * DIM
    _emb_view(spark, {i: list(v) for i in range(8)})
    rows = spark.sql(Q._pq_distortion_sql(Q.D.SPARK)).collect()
    assert len(rows) == M
    for r in rows:
        assert r["codes_used"] == 1
        assert r["hottest_share"] == 1.0
        assert r["mean_qerr"] == 0.0
