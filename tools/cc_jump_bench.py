"""Measure the CC pointer-jumping threshold (VERDICT r6 item 6).

connected_components switches from plain min-label propagation to
propagation+pointer-jumping at round `jump_from` (default 8). The round-6
constant was chosen, not measured. This times jump_from in {4, 8, 12} on:

- the production-shaped SHALLOW graph (250k chains x 8 nodes -> 2M
  undirected edge rows, diameter ~8): converges in ~chain_len rounds, so
  thresholds >= that are equivalent and lower ones pay extra node-sized
  self-joins;
- the same graph with a DEEP 1500-node chain mixed in: plain propagation
  alone would need ~1500 rounds; convergence is threshold + O(log 1500)
  jump rounds, so every 4 rounds of threshold delay costs 4 extra full
  propagation rounds over the 2M-edge relation.

Both use the bucketed edge-spill path (the at-scale configuration).
Usage: python tools/cc_jump_bench.py [n_chains=250000] [chain_len=8]
Prints one JSON line; recorded in SCALE.md.
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
    deep_len = 1500
    spark = get_spark("cc-jump-bench")

    shallow = (
        spark.range(n_chains * chain_len)
        .select(
            (
                (F.col("id") / chain_len).cast("long") * (chain_len + 1)
                + F.col("id") % chain_len
            ).alias("id_a")
        )
        .withColumn("id_b", F.col("id_a") + 1)
        .localCheckpoint()
    )
    base = n_chains * (chain_len + 1) + 1
    deep = (
        spark.range(deep_len - 1)
        .select((F.col("id") + base).alias("id_a"))
        .withColumn("id_b", F.col("id_a") + 1)
    )
    mixed = shallow.union(deep).localCheckpoint()

    def run(edges, jf):
        t0 = time.perf_counter()
        comps = connected_components(
            edges,
            max_iter=40,
            edge_spill_table="cc_jump_bench",
            spill_threshold=0,
            jump_from=jf,
        )
        agg = comps.agg(
            F.count("*").alias("n"), F.sum(F.col("comp") % 997).alias("chk")
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), (agg["n"], agg["chk"])

    out = {
        "n_chains": n_chains,
        "chain_len": chain_len,
        "deep_len": deep_len,
        "edges": mixed.count(),
    }
    for label, edges in (("shallow", shallow), ("deep_mixed", mixed)):
        ref = None
        for jf in (4, 8, 12):
            t, res = run(edges, jf)
            out[f"{label}_jump{jf}_sec"] = t
            if ref is None:
                ref = res
            assert res == ref, f"labeling diverged at jump_from={jf} ({label})"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
