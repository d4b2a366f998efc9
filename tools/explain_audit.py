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
         # round-5 additions: ANN variants + the syslog reader
         "ann_lsh", "ivf_topk", "read_syslog"]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
        bcast = "BroadcastHashJoin" in plan
        codegen = "WholeStageCodegen" in plan or "codegen" in plan.lower()
        out.append(f"## {name}")
        out.append("")
        out.append(f"- exchanges: {n_ex}")
        out.append(f"- broadcast join: {'yes' if bcast else 'n/a' if 'Join' not in plan else 'NO'}")
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
        fh.write("\n".join(out) + "\n")
    print("\n".join(out))


if __name__ == "__main__":
    main()
