"""N -> 4N EXECUTOR scaling on a REAL Spark standalone cluster.

Requires a running master (spark://127.0.0.1:7077) with 4 registered
workers (sbin/start-master.sh + 4x start-worker.sh). Each width runs
tools/cdc_submit_job.py via spark-submit --py-files with
--total-executor-cores {N*cores, 4N*cores}, i.e. 1 vs 4 SEPARATE
executor JVMs on distinct workers — two cluster sizes with real
executor launch, remote shuffle service paths, and driver<->executor
RPC in play.

Two modes (the per-executor core count is the lever — this single-VM
sandbox shares one DRAM bus, so wide executors saturate memory
bandwidth long before 4x cores; see BASELINE.md "scaling ladder"):

- saturated (default, --executor-cores 8): 1x8-core vs 4x8-core
  executors = the r4 artifact. Measures the host ceiling, not the
  plan (a pure-JVM control inverts identically).
- compute-bound (--executor-cores 1): 1x1-core vs 4x1-core executors.
  Total demand stays under the DRAM ceiling, so the measurement
  reflects the engine's actual partition-parallel scaling — the same
  pair where local[1]->local[4] records 0.87 efficiency.

Usage: python tools/standalone_cluster_ladder.py [n_events] [out.json]
           [--executor-cores C] [--trials T]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = "/opt/spark/bin/spark-submit"
MASTER = "spark://127.0.0.1:7077"


def run_width(total_cores: int, exec_cores: int, n_events: int,
              zip_path: str, trials: int = 3) -> dict:
    best = None
    secs = []
    for t in range(trials):
        out = subprocess.run(
            [SUBMIT, "--master", MASTER,
             "--executor-cores", str(exec_cores),
             "--executor-memory", "16g" if exec_cores >= 8 else "6g",
             "--driver-memory", "6g",
             "--total-executor-cores", str(total_cores),
             "--conf", f"spark.sql.shuffle.partitions={total_cores}",
             "--conf", "spark.sql.adaptive.enabled=true",
             "--py-files", zip_path,
             os.path.join(REPO, "tools", "cdc_submit_job.py"),
             str(n_events)],
            cwd="/tmp", capture_output=True, text=True, timeout=1200)
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        rep = json.loads(line)
        secs.append(rep["apply_sec"])
        if best is None or rep["apply_sec"] < best["apply_sec"]:
            best = rep
    best["trial_secs"] = secs
    return best


def main() -> None:
    argv = list(sys.argv[1:])
    exec_cores = 8
    trials = 3
    if "--executor-cores" in argv:
        i = argv.index("--executor-cores")
        exec_cores = int(argv[i + 1])
        del argv[i:i + 2]
    if "--trials" in argv:
        i = argv.index("--trials")
        trials = int(argv[i + 1])
        del argv[i:i + 2]
    n_events = int(argv[0]) if len(argv) > 0 else 8_000_000
    out_path = argv[1] if len(argv) > 1 else None
    sys.path.insert(0, REPO)
    from tenzir_spark.session import package_pyfiles
    zip_path = package_pyfiles()
    # interleave widths to share host-noise windows
    n = run_width(exec_cores, exec_cores, n_events, zip_path, trials)
    n4 = run_width(4 * exec_cores, exec_cores, n_events, zip_path, trials)
    thr_n = n_events / n["apply_sec"]
    thr_4n = n_events / n4["apply_sec"]
    eff = (thr_4n / thr_n) / 4
    result = {
        "workload": f"CDC apply via spark-submit on standalone cluster, "
                    f"{n_events} events, replay-equality asserted per run",
        "cluster": f"1 master + 4 workers, {exec_cores}-core executor "
                   "JVMs placed by the standalone scheduler "
                   "(1 vs 4 separate executors)",
        "n_executors": 1, "throughput_n": round(thr_n, 1),
        "apply_sec_n": n["apply_sec"], "trials_n": n["trial_secs"],
        "n4_executors": 4, "throughput_4n": round(thr_4n, 1),
        "apply_sec_4n": n4["apply_sec"], "trials_4n": n4["trial_secs"],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_target": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
