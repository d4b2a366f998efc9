"""Capture the physical plan of the CDC apply's pass-2 delta frame.

The cdc_apply headline is a write pipeline, not a declared query, so it
has no .explain() surface in bench_extra's plan mode. This tool runs a
small shape-matched apply (same generator, same epoch/coalesce
structure as bench.py's bench_cdc) with LakeTable._write_bucketed
hooked to dump the formatted plan of the delta DataFrame it is handed —
the exact frame whose scan the lsn-watermark prefilter must reach as a
pushed parquet predicate.

Usage:  python tools/cdc_plan_capture.py out.txt [n_events]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "cdc_apply_pass2.txt"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from tenzir_spark.session import get_spark
    spark = get_spark("cdc_plan_capture", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 4))

    from tenzir_spark.cdc import CdcEngine, gen_change_log, pages_schema
    from tenzir_spark.lake import LakeTable
    from tenzir_spark.lake.table import LakeTable as LT

    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_plan_", dir=tmp_base)
    plans: list[str] = []
    orig = LT._write_bucketed

    def hooked(self, df, *a, **kw):
        if kw.get("kind") == "delta" and not plans:
            plans.append(spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        return orig(self, df, *a, **kw)

    try:
        log_dir = os.path.join(root, "changelog")
        gen_change_log(
            spark, n_events,
            n_domains=200, pages_per_domain=500,
            events_per_epoch=max(n_events // 4, 1),
            schema_change_every=3,
            first_op_insert=False,
        ).write.mode("overwrite").partitionBy("epoch").parquet(log_dir)
        log = spark.read.parquet(log_dir)
        table = LakeTable.create(
            spark, os.path.join(root, "pages"), pages_schema(), "url",
            num_buckets=int(cpus), write_mode="mor")
        LT._write_bucketed = hooked
        CdcEngine(spark, table, n_salts=16).run(log)
    finally:
        LT._write_bucketed = orig
        shutil.rmtree(root, ignore_errors=True)

    if not plans:
        print("ERROR: no delta write observed", file=sys.stderr)
        sys.exit(1)
    with open(out_path, "w") as f:
        f.write(f"== cdc_apply pass-2 delta plan ({n_events} events, "
                f"first coalesced batch; captured at the _write_bucketed "
                f"boundary) ==\n\n")
        f.write(plans[0])
        f.write("\n")
    print(f"wrote {out_path} ({len(plans[0])} chars)")


if __name__ == "__main__":
    main()
