"""Generate sf-shaped synthetic test tables for LOCAL measurement only.

The driver owns /root/testdata/sf{0.001,0.01,0.1} (read-only, seed 42).
Optimization rounds need a larger corpus to see the costs the driver's
round-end measurement sees (its r5/r6 MEASUREMENT ran at sf=1.0), so
this tool regenerates the same table SHAPES and DISTRIBUTIONS at any
scale factor, derived by inspecting the driver data:

- documents: n=50k*sf/0.1-ish; token count U{10,100} over the same
  31-word vocabulary (30 common + rare 'dup'), ~0.16% exact-copy pairs,
  lang {en 41%, zh/es/fr ~15%, de 14%}, source = src{doc_id % 20}.
  The tiny vocabulary is what makes near-dup candidate volume explode
  at scale — the property the near-dup benchmarks exercise.
- events / lineitem / orders / customer / part / supplier / nation /
  region: TPC-H-ish star schema with the observed ranges.
- embeddings: 64-dim float vectors.

Files are written with pyarrow defaults (1Mi-row row groups), matching
the driver layout: documents and events are ONE row group at sf1.0 and
lineitem is 6 — the concentrated-scan regime `_needs_fanout` targets.

NOT byte-identical to the driver's generator (seed/recipe unknown) —
distributionally matched for timing, never used for oracle checks.

Usage: python tools/gen_sf.py /root/sfgen/sf1.0 1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "row",
         "the", "agg", "key", "query", "a", "scan", "batch"]
LANGS = (["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["de"] * 14)
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PTYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
PADJ = ["large", "hot", "small", "cold", "dim", "light", "dark", "fast"]
PNOUN = ["ring", "bolt", "screw", "cap", "plate", "wire", "gear", "pin"]
ETYPES = ["click", "view", "signup", "purchase", "error"]


def write(d, name, table):
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(out_dir: str, sf: float, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    k = sf / 0.1  # counts below are the observed sf0.1 counts

    # ---- documents ----------------------------------------------------
    n_docs = int(5000 * k)
    lens = rng.integers(10, 101, n_docs)
    # 30 common words plus 'dup' at the observed ~0.094% token rate
    probs = np.full(31, (1 - 0.00094) / 30)
    probs[30] = 0.00094
    total = int(lens.sum())
    toks = rng.choice(np.array(VOCAB + ["dup"]), size=total, p=probs)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    # ~0.16% of docs are exact copies of a random earlier doc
    n_copy = max(int(n_docs * 0.0016), 1)
    dst = rng.choice(np.arange(n_docs // 2, n_docs), n_copy, replace=False)
    src = rng.integers(0, n_docs // 2, n_copy)
    for a, b in zip(dst, src):
        texts[a] = texts[b]
    langs = [LANGS[i] for i in rng.integers(0, 100, n_docs)]
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # ---- embeddings ---------------------------------------------------
    n_emb = int(2000 * k)
    mat = rng.standard_normal((n_emb, 64)).astype(np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), 64).cast(
                pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    # ---- events -------------------------------------------------------
    n_ev = int(100_000 * k)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 86400 * 1_000_000, "us")
    ts = base + (np.sort(rng.random(n_ev)) * span.astype(np.int64)
                 ).astype("timedelta64[us]")
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(1500 * k), n_ev), pa.int64()),
        "event_type": pa.array([ETYPES[i] for i in rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(100.0, n_ev)
                                   .clip(0, 560.21), 2)),
        "props": pa.array([json.dumps({"k": int(v)})
                           for v in rng.integers(0, 100, n_ev)]),
    }))

    # ---- dims ---------------------------------------------------------
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": pa.array(REGIONS)}))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32())}))
    n_supp = int(1000 * k)
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.random(n_supp) * 10_000, 2))}))
    n_cust = int(15_000 * k)
    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.random(n_cust) * 10_000, 2)),
        "c_mktsegment": pa.array([SEGMENTS[i] for i in
                                  rng.integers(0, 5, n_cust)])}))
    n_part = int(20_000 * k)
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}"
                            for i in rng.integers(0, 64, n_part)]),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(1, 26, n_part)]),
        "p_type": pa.array([PTYPES[i] for i in rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + np.arange(n_part) * 0.1
                                           % 1000, 2))}))
    n_ord = int(150_000 * k)
    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 1500, n_ord).astype("timedelta64[D]"))
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array([("O", "F", "P")[i] for i in
                                   rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.random(n_ord) * 450_000 + 900,
                                          2)),
        "o_orderdate": pa.array([str(d) for d in odate]),
        "o_orderpriority": pa.array([PRIORITIES[i] for i in
                                     rng.integers(0, 5, n_ord)])}))
    n_li = int(600_000 * k)
    ship = (np.datetime64("1995-01-02T00:00:00", "us")
            + rng.integers(0, 2500, n_li).astype("timedelta64[D]")
            .astype("timedelta64[us]"))
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(900 + rng.random(n_li)
                                             * 104_000, 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100, 2)),
        "l_returnflag": pa.array([("N", "R", "A")[i] for i in
                                  rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array([("F", "O")[i] for i in
                                  rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us"))}))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfgen/sf1.0"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={sf} into {out}")
    gen(out, sf)
