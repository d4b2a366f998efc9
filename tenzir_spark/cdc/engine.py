"""CDC apply engine: ordered epoch tail -> schema evolution -> salted
max-lsn dedup -> MERGE -> exactly-once commit + lineage.

This is the north rule's pipeline, the Spark reinterpretation of the
reference's import path (libtenzir/builtins/operators/import.cpp:70 ->
importer.cpp:43-76 -> index.cpp:650-670 active partitions): where Tenzir
stamps import_time and routes slices to per-schema partitions, we stamp
lineage and MERGE keyed batches into per-bucket files under an idempotent
epoch ledger.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tenzir_spark.cdc.extract import extract_text_udf
from tenzir_spark.lake.table import LakeTable


def salted_deduplicate(df: DataFrame, key: str, lsn_col: str, n_salts: int = 16) -> DataFrame:
    """Two-phase max-lsn dedup with an explicit salt.

    Phase 1 reduces (key, salt) groups — a hot key's rows spread over
    ``n_salts`` reducers instead of one; phase 2 reduces the <=n_salts
    survivors per key. Both phases are hash aggregates with map-side
    partial aggregation, so even phase 2 never shuffles more than
    (distinct keys x n_salts) rows. This is the north rule's
    "salted-repartition to defuse hot-domain skew" expressed as
    aggregation (cheaper than repartition+window: no sort, no full row
    shuffle of duplicates).
    """
    others = [c for c in df.columns if c != key]
    salt = F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts)).cast("int")
    stage1 = (
        df.groupBy(F.col(key), salt.alias("__salt"))
        .agg(F.max_by(F.struct(*[F.col(c) for c in others]), F.col(lsn_col)).alias("__r"))
    )
    stage2 = (
        stage1.groupBy(key)
        .agg(F.max_by(F.col("__r"), F.col(f"__r.{lsn_col}")).alias("__r"))
    )
    return stage2.select(key, *[F.col(f"__r.{c}").alias(c) for c in others])


def descriptor_to_alter(desc: str) -> dict:
    """Avro-style JSON change-stream descriptor -> lake ALTER op.

    Supported directives (north rule: add / rename / widen — the
    reference's cast.hpp:387-499 record-cast lattice):
      {"type":"add","name":...,"spark_type":...}
      {"type":"rename","from":...,"to":...}
      {"type":"widen","name":...,"spark_type":...}
    """
    d = json.loads(desc)
    t = d["type"]
    if t == "add":
        return {"op": "add", "name": d["name"], "type": d["spark_type"]}
    if t == "rename":
        return {"op": "rename", "from": d["from"], "to": d["to"]}
    if t == "widen":
        return {"op": "widen", "name": d["name"], "type": d["spark_type"]}
    raise ValueError(f"unknown schema descriptor {desc!r}")


class CdcEngine:
    """Applies an ordered (lsn, op, payload) change log to a LakeTable
    epoch by epoch, exactly once."""

    def __init__(self, spark: SparkSession, table: LakeTable, n_salts: int = 16):
        self.spark = spark
        self.table = table
        self.n_salts = n_salts

    def apply_epoch(self, change_log: DataFrame, epoch: int,
                    descriptors: list[str] | None = None) -> dict:
        """``descriptors``: this epoch's schema-change directives, if the
        caller already fetched them (run() prefetches ALL epochs'
        descriptors in one job); None -> collect them here."""
        ek = str(epoch)
        self.table.refresh()
        if ek in self.table.snapshot.ledger:
            return {**self.table.snapshot.ledger[ek], "skipped": True}

        batch = change_log.filter(F.col("epoch") == epoch)

        # 1. schema evolution, transactionally BEFORE the merge (north rule)
        if descriptors is None:
            descriptors = [
                r[0] for r in batch.filter(F.col("op") == "schema")
                .select("schema_descriptor").collect()
            ]
        alters = [descriptor_to_alter(d) for d in descriptors if d]
        if alters:
            self.table.alter(alters)

        # 2. shape data rows to the (evolved) table schema. Text extraction
        #    is deferred until AFTER dedup so the Arrow UDF only ever runs
        #    on rows that survive the max-lsn race (at high update rates
        #    that is a large constant-factor saving).
        key = self.table.snapshot.key_col
        schema_fields = {f.name: f.dataType for f in self.table.snapshot.schema.fields}
        payload_cols = list(schema_fields)
        derive_text = "html" in batch.columns and "text" in payload_cols
        data = batch.filter(F.col("op") != "schema")
        cols = [F.col(key), F.col("op"), F.col("lsn")]
        for c in payload_cols:
            if c == key or (c == "text" and derive_text):
                continue
            if c in data.columns:
                cols.append(F.col(c))
            else:
                cols.append(F.lit(None).cast(schema_fields[c]).alias(c))
        shaped = data.select(*cols)

        post = (lambda df: df.withColumn("text", extract_text_udf(F.col("html")))) \
            if derive_text else None

        if self.table.mode == "mor":
            # 3+4 fused: the lake clusters by bucket and dedups per
            # partition in one shuffle (see LakeTable._merge_mor); the
            # text UDF runs post-dedup inside the same stage.
            return self.table.merge(shaped, epoch, pre_deduplicated=False,
                                    post_dedup=post)

        # CoW: 3. max-lsn dedup per key, salted against hot-domain skew
        deduped = salted_deduplicate(shaped, key, "lsn", self.n_salts)
        if post is not None:
            deduped = post(deduped)
        # 4. MERGE under the idempotent ledger
        return self.table.merge(deduped, epoch)

    def run(self, change_log: DataFrame, epochs: list[int] | None = None) -> list[dict]:
        """Tail the log in epoch order (resumable: already-applied epochs
        short-circuit via the ledger).

        ONE upfront scan discovers both the epoch list and every epoch's
        schema directives (collect_list skips the nulls of non-schema
        rows) — serial pre-work is a single job regardless of epoch
        count, which matters because per-epoch serial cost is the Amdahl
        term of the whole apply path (BASELINE.md)."""
        if epochs is None:
            rows = (change_log.groupBy("epoch").agg(
                F.collect_list(F.when(F.col("op") == "schema",
                                      F.col("schema_descriptor"))).alias("ds"))
                .collect())
            epochs = sorted(r["epoch"] for r in rows)
            desc = {r["epoch"]: [d for d in r["ds"] if d] for r in rows}
        else:
            desc = {}
            for r in (change_log.filter(F.col("op") == "schema")
                      .select("epoch", "schema_descriptor").collect()):
                desc.setdefault(r[0], []).append(r[1])
        return [self.apply_epoch(change_log, e, descriptors=desc.get(e, []))
                for e in epochs]
