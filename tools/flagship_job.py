#!/usr/bin/env python
"""Flagship extract+clip job for the two-cluster-size scaling evidence.

Run via spark-submit (the deployment mode named by the north rule):

    spark-submit --master local[8]  --py-files <pkg.zip> tools/flagship_job.py \
        --docs 10000000 --passes 3

The sandbox has one 32-core host, so the rule's N vs 4N executor criterion
is evidenced with local[8] vs local[32] on the same cached corpus and the
same code (see BENCH/BASELINE.md).

The timed region per pass:
  1. extract: 1024-point AOI → broadcast equi-join on cell_id against the
     tile-pruned corpus scan, spans carried through (span-sequence parity).
  2. clip: quarter-window tile-pruned subset with the canonical span_hash
     (md5 over the ordered span units) computed for every clipped doc.

Prints ONE JSON line: {"cpus", "docs", "passes", "sec", "docs_per_sec"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=2)
    args = ap.parse_args()

    from bench import FLAG_CELL, corpus_path, ensure_corpus, flagship_grid
    from geowombat_spark.operators import extract as ex
    from geowombat_spark.operators import sops
    from geowombat_spark.pipeline import multimodal

    spark = (
        SparkSession.builder.appName("gw-flagship")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, 8)))

    grid = flagship_grid(args.docs)
    path = ensure_corpus(spark, args.docs)
    docs = spark.read.option("basePath", path).parquet(path)

    step_r = max(1, grid.nrows // 32)
    step_c = max(1, grid.ncols // 32)
    rr, cc = np.meshgrid(
        np.arange(32) * step_r + step_r // 2, np.arange(32) * step_c + step_c // 2
    )
    aoi = pd.DataFrame(
        {
            "id": np.arange(1024, dtype=np.int64),
            "x": (cc.ravel() + 0.5) * FLAG_CELL,
            "y": -((rr.ravel() + 0.5) * FLAG_CELL),
        }
    )

    def one_pass(verbose: bool = False) -> None:
        t = time.time()
        pts = ex.extract_points(
            spark,
            docs,
            aoi,
            grid,
            bands=["blue", "green", "red"],
            keep_doc_columns=["doc_id", "spans"],
            ordered=False,
        )
        pts.write.mode("overwrite").format("noop").save()
        t1 = time.time()
        clip = sops.subset(
            docs, grid, left=0.0, top=0.0, rows=grid.nrows // 2, cols=grid.ncols // 2
        )
        clip = multimodal.with_span_hash(clip)
        clip.select("doc_id", "cell_id", "band_blue", "span_hash").write.mode(
            "overwrite"
        ).format("noop").save()
        t2 = time.time()
        # span-integrity audit over the FULL corpus: the canonical span_hash
        # for every document (the per-row span-sequence invariant), reduced
        # to a count so only the hashing dominates.
        multimodal.with_span_hash(docs).select("span_hash").write.mode(
            "overwrite"
        ).format("noop").save()
        t3 = time.time()
        if verbose:
            print(
                f"[stage] extract={t1-t:.2f}s clip+hash={t2-t1:.2f}s "
                f"audit={t3-t2:.2f}s",
                file=sys.stderr,
                flush=True,
            )

    # untimed warmups: page cache + broadcast machinery + C2 compilation of
    # the codegen'd hash loops
    for _ in range(args.warmups):
        one_pass()
    samples = []
    for _ in range(args.passes):
        t0 = time.time()
        one_pass(verbose=True)
        samples.append(round(time.time() - t0, 3))
    # min-of-passes: this sandbox is a shared-host microVM, so individual
    # passes absorb neighbor noise; the minimum is the least-contended
    # sample of the same deterministic work (all samples are reported).
    best = min(samples)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": args.docs,
                "passes": args.passes,
                "sec": best,
                "samples": samples,
                "docs_per_sec": round(args.docs / best, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
