"""Physical-plan audit: runs .explain(formatted) over the entry queries
and greps for the properties that matter at 100 TB — filters reaching
PushedFilters, pruned ReadSchema, broadcast joins on small dims, exchange
counts. Writes EXPLAIN.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tenzir_spark.session import get_spark  # noqa: E402

AUDIT = ["where_select", "summarize", "sort", "join_agg", "tpch_q6",
         "dedup_max_lsn", "top", "cosine_topk", "exact_dedup",
         # round-2 additions: the formerly-weak plans (global window /
         # signature-carrying shuffle) and the new expression surface
         "enumerate", "minhash_near_dups", "where_arith", "tql_pipeline",
         # round-3 additions: flat-scan pair stages + packet surface
         "simhash", "ngram_jaccard", "near_dup_composed", "decapsulate",
         "netflow",
         # round-5 additions: ANN variants + the syslog reader + the
         # exact embedding near-dup (broadcast NLJ, corpus never shuffles)
         "ann_lsh", "ivf_topk", "read_syslog", "embed_near_dups"]

# Engine-path plan audited by hand (not a board query); kept here so
# regenerating the file doesn't lose it.
CDC_FOOTER = """
## cdc broadcast two-pass dedup (engine path, `lake/table.py _prepare_mor`)

Not a board query — the plan `_prepare_mor` builds when the batch's
estimated key count fits a broadcast (r5; the at-scale struct-`max_by`
fallback is audited above as `dedup_max_lsn`). Verified shape at
local[4], 50k-event batch:

```
BroadcastHashJoin LeftSemi BuildRight
+- scan (payload columns)                 <- pass 2: full rows, NO shuffle
+- BroadcastExchange
   +- HashAggregate(final max(__lsn))
      +- Exchange (key)                    <- only exchange of the agg
         +- HashAggregate(partial max)     <- map-side combine, (key,lsn) only
... Exchange hashpartitioning(__b, nb)     <- survivors only, bucket write
```

- 2 exchanges total: the narrow (key,lsn) aggregate and the final
  nb-partition bucket distribution of SURVIVORS. Payload rows reach the
  writer without ever hash-shuffling — the max_by fallback's
  survivors-only exchange is already gone here.
- `BroadcastHashJoin LeftSemi BuildRight`: the (key, max_lsn) set
  builds once per executor; semantics pinned byte-identical to the
  fallback by `test_dedup_bcast_and_fallback_paths_identical`.
- The partial `HashAggregate` before the agg exchange is the Zipf
  hot-key defense: each input partition reduces a hot domain's rows to
  one (key, max) pair pre-shuffle.
"""


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # render the full lineage: the r6 pre-orderBy lazy-checkpoint barrier
    # (see __spark_entry__._ckpt) otherwise truncates the audited plan at
    # a Scan ExistingRDD node (results identical either way)
    os.environ["TENZIR_SPARK_NO_CKPT"] = "1"
    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=4)
    qs = entrymod.queries()
    out = ["# EXPLAIN audit — physical-plan properties of headline queries",
           "", f"Generated from `tools/explain_audit.py` at `{sf_dir}`.", ""]
    for name in AUDIT:
        plan = plan_of(qs[name](spark, sf_dir))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed = [p for p in pushed if p.strip()]
        read = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        if "BroadcastNestedLoopJoin" in plan:
            bcast = "yes (nested-loop: non-equi pair join, build side broadcast)"
        elif "BroadcastHashJoin" in plan:
            bcast = "yes"
        elif "Join" in plan:
            bcast = "NO"
        else:
            bcast = "n/a"
        codegen = "WholeStageCodegen" in plan or "codegen" in plan.lower()
        out.append(f"## {name}")
        out.append("")
        out.append(f"- exchanges: {n_ex}")
        out.append(f"- broadcast join: {bcast}")
        if pushed:
            out.append(f"- pushed filters: `{'; '.join(pushed)[:300]}`")
        if read:
            cols = read[0].split(",")
            out.append(f"- read schema ({len(cols)} cols): `{read[0][:200]}`")
        out.append("")
        flags = []
        if "Filter" in plan and not pushed and name in ("where_select", "tpch_q6"):
            flags.append("WARNING: filter did not push down")
        for f in flags:
            out.append(f"**{f}**")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "EXPLAIN.md"), "w") as fh:
        fh.write("\n".join(out) + "\n" + CDC_FOOTER)
    print("\n".join(out))


if __name__ == "__main__":
    main()
