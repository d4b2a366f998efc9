"""Interleaved noise-control experiment for bench swings (VERDICT r4 #1).

Alternates the query under suspicion (ngram_jaccard at sf0.1) with a
fixed PURE-JVM control job (sha2 over a range — zero Python workers, no
shuffle reuse with the query) in the same session, N rounds. If the
query's wall-time swings are host noise, the control swings WITH it
(correlated); if the query itself regressed, the control stays flat
while the query drifts.

Usage: python tools/noise_control.py [rounds]
Prints one JSON line:
{"rounds": N, "query_secs": [...], "control_secs": [...],
 "pearson_r": r, "query_min": s, "control_min": s}
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
from pyspark.sql import functions as F

from tenzir_spark.session import get_spark
from tenzir_spark.functions import dedup


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("noise_control", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d.count()

    def control():
        # pure JVM: whole-stage codegen sha2 loop, fixed work, no Python
        (spark.range(0, 40_000_000, 1, cpus)
         .select(F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))
                 .alias("s")).write.format("noop").mode("overwrite").save())

    def query():
        dedup.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.6) \
            .write.format("noop").mode("overwrite").save()

    # one warmup each (codegen + python worker pool)
    control()
    query()
    q_secs, c_secs = [], []
    for _ in range(rounds):
        t0 = time.perf_counter(); query(); q_secs.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); control(); c_secs.append(time.perf_counter() - t0)
    r = float(np.corrcoef(q_secs, c_secs)[0, 1]) if rounds > 1 else None
    print(json.dumps({
        "rounds": rounds,
        "query_secs": [round(x, 2) for x in q_secs],
        "control_secs": [round(x, 2) for x in c_secs],
        "pearson_r": round(r, 3) if r is not None else None,
        "query_min": round(min(q_secs), 2),
        "control_min": round(min(c_secs), 2),
    }))


if __name__ == "__main__":
    main()
