"""Extra benchmark tooling for optimization rounds (bench.py is frozen
for measurement; this file is NOT part of the driver contract).

Modes:
  python bench_extra.py time  [q1,q2,...]   -- noop-sink timings, best/all trials
  python bench_extra.py plans [q1,q2,...]   -- dump .explain('formatted') to plans/<tag>/
Env:
  SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0)
  SPARK_GRAFT_CPUS   (default 32)
  BENCH_TRIALS       (default 3)
  PLAN_TAG           (default r06) and PLAN_SUFFIX (default '_before')
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_session():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    if "TENZIR_SPARK_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        scratch = "/dev/shm/tenzir_bench_scratch_extra"
        os.makedirs(scratch, exist_ok=True)
        os.environ["TENZIR_SPARK_LOCAL_DIR"] = scratch
    from tenzir_spark.session import get_spark
    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 4))
    # same warmup as bench.py: spawn Arrow workers + JIT codegen paths
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(x):
        return x

    (spark.range(int(cpus) * 4).repartition(int(cpus))
     .select(_warm("id").alias("v")).groupBy().sum("v")
     .write.format("noop").mode("overwrite").save())
    return spark


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    import __spark_entry__ as entry
    spark = get_session()
    qs = entry.queries()
    names = only or list(qs)

    if mode == "plans":
        tag = os.environ.get("PLAN_TAG", "r06")
        suffix = os.environ.get("PLAN_SUFFIX", "_before")
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", tag)
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            if name not in qs:
                continue
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
            print("wrote", name)
        return

    timings: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        obs = []
        for _ in range(trials):
            df = qs[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            obs.append(round(time.perf_counter() - t0, 3))
        timings[name] = obs
        print(json.dumps({"q": name, "best": min(obs), "trials": obs}),
              flush=True)
    print(json.dumps({"sf_dir": sf_dir,
                      "best": {k: min(v) for k, v in timings.items()}}))


if __name__ == "__main__":
    main()
