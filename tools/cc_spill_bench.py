"""Measure the connected-components edge-spill path (VERDICT r5 item 1).

The sf0.1 oracle-gate graphs are a few hundred edges -- iteration cost is
invisible there. This synthesizes a dedup-shaped graph big enough that the
per-round handling of the STATIC undirected edge relation dominates:
C chain-components of length L (min-label propagation needs ~L rounds, so
every round re-touches all 2*C*L undirected edge rows), and times the
in-memory loop (edge relation localCheckpointed, re-Exchanged every round)
against the bucketed edge-spill loop (edge relation written once clustered
on the join key; every round's join reads co-located buckets with no
Exchange above the edge scan).

Usage: python tools/cc_spill_bench.py [n_chains=250000] [chain_len=8]
Prints one JSON line; results recorded in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators.dedup import connected_components
from sentiment_analysis_data_pipeline_spark.session import get_spark


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("cc-spill-bench")

    # edge i: chain c = i // chain_len, position p = i % chain_len,
    # src = c*(chain_len+1)+p, dst = src+1  ->  C disjoint chains
    edges = (
        spark.range(n_chains * chain_len)
        .select(
            (
                (F.col("id") / chain_len).cast("long") * (chain_len + 1)
                + F.col("id") % chain_len
            ).alias("id_a")
        )
        .withColumn("id_b", F.col("id_a") + 1)
        .localCheckpoint()  # keep generation cost out of both timings
    )
    n_edges = edges.count()

    def run(**kw):
        t0 = time.perf_counter()
        comps = connected_components(edges, **kw)
        # count + a label checksum: forces the full result and catches
        # any spill-path divergence at this scale
        agg = comps.agg(
            F.count("*").alias("n"), F.sum(F.col("comp") % 997).alias("chk")
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), agg["n"], agg["chk"]

    t_mem, n_mem, chk_mem = run()
    t_spill, n_spill, chk_spill = run(
        edge_spill_table="cc_spill_bench", spill_threshold=0
    )
    assert (n_mem, chk_mem) == (n_spill, chk_spill), "spill path diverged"

    print(
        json.dumps(
            {
                "n_chains": n_chains,
                "chain_len": chain_len,
                "edges": n_edges,
                "nodes": n_mem,
                "in_memory_sec": t_mem,
                "edge_spill_sec": t_spill,
            }
        )
    )


if __name__ == "__main__":
    main()
