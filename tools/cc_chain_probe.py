#!/usr/bin/env python
"""Worst-case convergence probe for ``dedup_groups`` connected
components: a single CHAIN of 200,000 nodes (graph diameter 200k — the
adversarial input for label propagation; real near-dup graphs are far
shallower) plus 10,000 disjoint 5-cliques as control components.

Min-label propagation alone needs O(diameter) rounds on a chain — 200k
rounds would blow the ``max_iter=30`` cap by four orders of magnitude.
The pointer-jumping step (label <- label(label) each round) is what
collapses it to O(log diameter): if this probe converges without the
non-convergence RuntimeWarning and labels every chain node 0, the
100-TB claim ("rounds ~ log of the deepest duplicate cluster") holds on
the worst topology, not just on the shallow star/clique shapes the unit
tests use.

Run: python tools/cc_chain_probe.py   (deterministic, no RNG)
"""
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowombat_spark.pipeline import dedup
from geowombat_spark.sources.tables import get_spark

N_CHAIN = 200_000
N_CLIQUES, CLIQUE = 10_000, 5
CLIQUE_BASE = 10_000_000  # id offset so clique ids never touch chain ids


def main() -> None:
    spark = get_spark(
        app="cc-chain", master="local[16]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    chain = spark.range(N_CHAIN - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    # clique c connects members base+c*K .. base+c*K+K-1 pairwise via
    # the K-1 edges to its minimum member (same components, fewer edges)
    cliques = (
        spark.range(N_CLIQUES * (CLIQUE - 1))
        .select(
            (F.col("id") / (CLIQUE - 1)).cast("long").alias("c"),
            (F.col("id") % (CLIQUE - 1)).alias("m"),
        )
        .select(
            (F.lit(CLIQUE_BASE) + F.col("c") * CLIQUE).alias("doc_a"),
            (
                F.lit(CLIQUE_BASE) + F.col("c") * CLIQUE + F.col("m") + 1
            ).alias("doc_b"),
        )
    )
    pairs = chain.unionAll(cliques)

    t0 = time.time()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        groups = dedup_groups_run(pairs)
        n_nodes = groups.count()
    wall = time.time() - t0
    nonconv = [
        w for w in caught if "did not converge" in str(w.message)
    ]
    assert not nonconv, "pointer jumping failed on the chain topology"

    n_groups = groups.select("group_id").distinct().count()
    chain_root = (
        groups.filter(F.col("doc_id") < N_CHAIN)
        .select("group_id")
        .distinct()
        .collect()
    )
    assert n_nodes == N_CHAIN + N_CLIQUES * CLIQUE, n_nodes
    assert n_groups == 1 + N_CLIQUES, n_groups
    assert [r[0] for r in chain_root] == [0], chain_root
    # every clique's group id is its minimum member
    bad = groups.filter(
        (F.col("doc_id") >= CLIQUE_BASE)
        & (
            F.col("group_id")
            != (
                F.floor(
                    (F.col("doc_id") - CLIQUE_BASE) / CLIQUE
                ).cast("long")
                * CLIQUE
                + CLIQUE_BASE
            )
        )
    ).count()
    assert bad == 0, bad
    print(
        f"RESULT chain_diameter={N_CHAIN} nodes={n_nodes} "
        f"groups={n_groups} wall={wall:.1f}s converged=True"
    )
    spark.stop()


def dedup_groups_run(pairs):
    return dedup.dedup_groups(pairs)


if __name__ == "__main__":
    main()
