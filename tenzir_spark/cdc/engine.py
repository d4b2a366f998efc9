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
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tenzir_spark.cdc.extract import extract_text_udf
from tenzir_spark.lake.table import LakeTable


def _epoch_rows_from_footers(change_log: DataFrame) -> dict[int, int] | None:
    """Per-epoch row counts read from the parquet footers of an
    epoch-partitioned file-backed log — a driver-side metadata read that
    replaces a full-scan discovery aggregate (r6). Returns None when the
    log is not a local epoch-partitioned parquet directory (streaming
    micro-batch frames, filtered views, remote filesystems) or has too
    many files for a cheap footer sweep — callers then fall back to the
    scan-based discovery."""
    try:
        # bare-scan check: inputFiles() ignores row filters, so a
        # filtered view could "discover" epochs whose surviving row set
        # is empty and wrongly ledger them as applied — only trust the
        # footers when the frame is the unmodified file relation
        plan = change_log._jdf.queryExecution().analyzed().toString()
        if not plan.lstrip().startswith("Relation"):
            return None
        files = change_log.inputFiles()
    except Exception:
        return None
    if not files or len(files) > 4096:
        return None
    try:
        import pyarrow.parquet as pq
        from urllib.parse import unquote, urlparse
        out: dict[int, int] = {}
        for f in files:
            if "epoch=" not in f or not f.endswith(".parquet"):
                return None
            epoch = int(f.split("epoch=")[1].split("/")[0])
            path = unquote(urlparse(f).path) if f.startswith("file:") else f
            out[epoch] = out.get(epoch, 0) + pq.ParquetFile(path).metadata.num_rows
        return out
    except Exception:
        return None


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

        # 2. shape data rows to the (evolved) table schema
        shaped, post = self._shape(batch, list(self.table.snapshot.schema.fields))

        if self.table.mode == "mor":
            # 3+4 fused: the lake clusters by bucket and dedups per
            # partition in one shuffle (see LakeTable._merge_mor); the
            # text UDF runs post-dedup inside the same stage.
            return self.table.merge(shaped, epoch, pre_deduplicated=False,
                                    post_dedup=post)

        # CoW: 3. max-lsn dedup per key, salted against hot-domain skew
        key = self.table.snapshot.key_col
        deduped = salted_deduplicate(shaped, key, "lsn", self.n_salts)
        if post is not None:
            deduped = post(deduped)
        # 4. MERGE under the idempotent ledger
        return self.table.merge(deduped, epoch)

    def _shape(self, batch: DataFrame, schema_fields: list,
               added_gate: dict[str, int] | None = None):
        """Project a raw change batch onto a FROZEN schema view (list of
        StructFields): key + op + lsn + payload columns, missing payload
        columns as typed nulls. Text extraction is deferred until AFTER
        dedup (returned as ``post``) so the Arrow UDF only ever runs on
        rows that survive the max-lsn race — at high update rates that
        is a large constant-factor saving.

        ``added_gate`` (column -> epoch it was ADDed in) keeps a
        coalesced multi-epoch batch faithful to sequential semantics:
        a value some event carried BEFORE the column's add-epoch would
        have been dropped by the per-epoch shape (the column wasn't in
        the table schema yet), so the coalesced shape nulls it out the
        same way instead of resurrecting it."""
        key = self.table.snapshot.key_col
        types = {f.name: f.dataType for f in schema_fields}
        payload_cols = list(types)
        derive_text = "html" in batch.columns and "text" in payload_cols
        data = batch.filter(F.col("op") != "schema")
        cols = [F.col(key), F.col("op"), F.col("lsn")]
        for c in payload_cols:
            if c == key or (c == "text" and derive_text):
                continue
            if c in data.columns:
                expr = F.col(c)
                if added_gate and c in added_gate:
                    expr = F.when(F.col("epoch") >= F.lit(added_gate[c]),
                                  expr)
                cols.append(expr.alias(c))
            else:
                cols.append(F.lit(None).cast(types[c]).alias(c))
        post = (lambda df: df.withColumn("text", extract_text_udf(F.col("html")))) \
            if derive_text else None
        return data.select(*cols), post

    def run(self, change_log: DataFrame, epochs: list[int] | None = None,
            max_inflight: int | None = None,
            max_coalesce: int | None = None) -> list[dict]:
        """Tail the log in epoch order (resumable: already-applied epochs
        short-circuit via the ledger).

        ONE upfront scan discovers both the epoch list and every epoch's
        schema directives (collect_list skips the nulls of non-schema
        rows) — serial pre-work is a single job regardless of epoch
        count, which matters because per-epoch serial cost is the Amdahl
        term of the whole apply path (BASELINE.md).

        MoR mode COALESCES a backlog: runs of up to ``max_coalesce``
        (default 8) consecutive pending epochs with no schema directive
        between them apply as ONE job — union the epochs, max-lsn dedup
        across the whole range, one delta write, one atomic commit that
        ledgers every constituent epoch (merge_commit_batch). This is
        semantically transparent: lsn is globally monotone, so the
        per-key max-lsn survivor of the union is exactly the row
        sequential application would leave visible, and the MoR read
        path merges deltas by max lsn anyway. What it buys is
        amortization of the per-epoch fixed cost that profiling
        (tools/cdc_profile.py) shows dominates small epochs — the Spark
        job itself (scheduling, python workers, 32 parquet
        opens/closes), ~5-6 s per 1M-event epoch on this host, against
        commit+checkpoint at ~5 ms. A batch never spans a schema-change
        epoch: alters apply in epoch order at batch boundaries, so every
        batch is shaped against one frozen schema view. A LIVE tail
        (epoch-by-epoch arrival) degenerates to batches of 1 — coalescing
        engages exactly when there's a backlog to catch up on, the same
        adaptive batching a Structured Streaming microbatch trigger does.

        MoR also PIPELINES batches: up to ``max_inflight`` (default 2)
        batch PREPARE jobs (scan -> dedup -> delta write) run
        concurrently — a delta never reads the target, so only the
        ledger COMMIT must stay ordered. Measured honestly (round 5,
        local[32], 16M events, pre-coalescing): break-even on this
        saturated single host (24.8 s vs 25.0 s at 4x4M epochs; 99.7 s
        vs 102.8 s at 16x1M — the prepare job already uses every core).
        The overlap pays on a real cluster where the driver's per-epoch
        serial work and stragglers leave executors idle between jobs;
        here it simply doesn't hurt. Each batch's files carry the
        schema_epoch tag of the view they were shaped against, so
        _align's rename/add replay stays exact even when a later
        batch's ALTER is already live. On a prepare failure nothing
        from that batch onward commits — already-prepared later files
        are orphans reclaimed by expire_snapshots' grace window, and a
        rerun resumes from the ledger. Both disabled for CoW, where
        epoch N+1's merge reads the state epoch N wrote.
        """
        kest: dict[int, int] = {}
        rest: dict[int, int] | None = None
        if epochs is None:
            # discovery, cheapest first: when the log is file-backed and
            # epoch-partitioned, per-epoch ROW counts come straight from
            # the parquet footers (driver metadata read, no job) and the
            # only scan is the op=='schema' descriptor filter — pruned to
            # three narrow columns. _prepare_mor turns the row bound into
            # an EXACT key count via its checkpointed pass-1 aggregate.
            # Non-file logs keep the r5 single-pass discovery whose
            # approx_count_distinct rides the scan; its per-batch sum
            # gates the broadcast two-pass dedup the same way.
            rest = _epoch_rows_from_footers(change_log)
            if rest is not None:
                epochs = sorted(rest)
                desc = {e: [] for e in epochs}
                for r in (change_log.filter(F.col("op") == "schema")
                          .select("epoch", "schema_descriptor").collect()):
                    desc.setdefault(r[0], []).append(r[1])
            else:
                keyc = self.table.snapshot.key_col
                rows = (change_log.groupBy("epoch").agg(
                    F.collect_list(F.when(F.col("op") == "schema",
                                          F.col("schema_descriptor"))).alias("ds"),
                    F.approx_count_distinct(keyc).alias("ks"))
                    .collect())
                epochs = sorted(r["epoch"] for r in rows)
                desc = {r["epoch"]: [d for d in r["ds"] if d] for r in rows}
                kest = {r["epoch"]: int(r["ks"]) for r in rows}
        else:
            desc = {}
            for r in (change_log.filter(F.col("op") == "schema")
                      .select("epoch", "schema_descriptor").collect()):
                desc.setdefault(r[0], []).append(r[1])
        if max_inflight is None:
            max_inflight = int(os.environ.get("TENZIR_SPARK_CDC_INFLIGHT", "2"))
        if max_coalesce is None:
            max_coalesce = int(os.environ.get("TENZIR_SPARK_CDC_COALESCE", "8"))
        if self.table.mode != "mor":
            return [self.apply_epoch(change_log, e, descriptors=desc.get(e, []))
                    for e in epochs]
        return self._run_batched(change_log, epochs, desc,
                                 max(max_inflight, 1), max(max_coalesce, 1),
                                 kest=kest, rest=rest)

    def _batches(self, epochs: list[int], desc: dict,
                 max_coalesce: int) -> list[list[int]]:
        """Split pending epochs into coalescible runs, capped at
        ``max_coalesce``. Only consecutive epochs coalesce — a gap (an
        already-applied epoch in the middle, from a crashed earlier run)
        splits the run so each batch stays a contiguous, prunable epoch
        range. Schema-change epochs coalesce INTO a batch when every
        alter in them is an ADD or WIDEN (adds are epoch-gated in
        _shape; widens are lossless by definition, and the log's parquet
        column type is uniform across the whole file anyway); a RENAME
        still starts a fresh batch — the log's column identity changes
        mid-span, so pre-rename epochs must be shaped under the old
        name."""
        def must_split(e: int) -> bool:
            for d in desc.get(e, []) or []:
                if d and json.loads(d).get("type") == "rename":
                    return True
            return False

        out: list[list[int]] = []
        cur: list[int] = []
        for e in epochs:
            if cur and (must_split(e) or len(cur) >= max_coalesce
                        or e != cur[-1] + 1):
                out.append(cur)
                cur = []
            cur.append(e)
        if cur:
            out.append(cur)
        return out

    def _run_batched(self, change_log: DataFrame, epochs: list[int],
                     desc: dict, max_inflight: int,
                     max_coalesce: int,
                     kest: dict[int, int] | None = None,
                     rest: dict[int, int] | None = None) -> list[dict]:
        from concurrent.futures import ThreadPoolExecutor

        self.table.refresh()
        results: dict[int, dict] = {}
        pending: list[int] = []
        for e in epochs:
            ek = str(e)
            if ek in self.table.snapshot.ledger:
                results[e] = {**self.table.snapshot.ledger[ek],
                              "skipped": True}
            else:
                pending.append(e)
        submitted: list[tuple[list[int], object]] = []
        with ThreadPoolExecutor(max_workers=max_inflight) as ex:
            try:
                for batch in self._batches(pending, desc, max_coalesce):
                    # ALL the batch's alters serially, in epoch order,
                    # BEFORE shaping — metadata-only, so running them
                    # ahead of earlier data commits is safe (_align
                    # replays renames/adds from each file's schema_epoch
                    # tag); adds record their epoch so _shape can gate
                    # per-row exactly like sequential application would
                    alters: list[dict] = []
                    added: dict[str, int] = {}
                    for e in batch:
                        for d in desc.get(e, []):
                            if not d:
                                continue
                            a = descriptor_to_alter(d)
                            alters.append(a)
                            if a["op"] == "add":
                                added[a["name"]] = e
                    if alters:
                        self.table.alter(alters)
                    fields = list(self.table.snapshot.schema.fields)
                    sepoch = len(self.table.snapshot.schema_log)
                    # contiguous range -> BETWEEN prunes the epoch=
                    # partition dirs of the log at the source
                    shaped, post = self._shape(
                        change_log.filter(
                            F.col("epoch").between(batch[0], batch[-1])),
                        fields, added_gate=added)
                    # batch key estimate: sum of per-epoch approx counts —
                    # an upper bound on the union (overlap only shrinks
                    # it), so an overestimate errs toward the safe
                    # at-scale fallback, never toward an oversized
                    # broadcast
                    batch_est = (sum(kest.get(e, 0) for e in batch)
                                 if kest and all(e in kest for e in batch)
                                 else None)
                    batch_rows = (sum(rest.get(e, 0) for e in batch)
                                  if rest and all(e in rest for e in batch)
                                  else None)
                    submitted.append((batch, ex.submit(
                        self.table._prepare_mor, shaped, "op", "lsn",
                        False, post, fields, sepoch, batch_est,
                        batch_rows)))
                for batch, fut in submitted:
                    new_files, entry = fut.result()
                    got = self.table.merge_commit_batch(
                        [str(e) for e in batch], new_files, entry)
                    for e in batch:
                        results[e] = got[str(e)]
            finally:
                for _, fut in submitted:
                    fut.cancel()
        return [results[e] for e in epochs]

    # ---------------------------------------------------------- streaming

    def run_stream(self, log_dir: str, checkpoint_dir: str,
                   trigger: dict | None = None,
                   max_inflight: int | None = None,
                   max_coalesce: int | None = None):
        """LIVE tail: Structured Streaming file source over the growing
        epoch-partitioned change log, applied per micro-batch through
        the same run() path (coalescing + ledger).

        Sibling: ``streaming.stream_cdc_apply`` tails an EPOCH-LESS
        stream and ledgers by Spark micro-batch id; this method is for
        logs that carry their own epoch column — the ledger keys stay
        the log's epochs, so a resume (or a plain batch run()) remains
        interchangeable with the stream.

        Exactly-once composes from two layers: Spark's streaming
        checkpoint makes foreachBatch at-least-once over file arrivals,
        and the lake's epoch ledger makes re-delivered epochs no-ops —
        the classic idempotent-sink recipe, and the streaming analog of
        the reference's importer/active-partition path (import.cpp:70).

        Contract (the same one every file-based tail assumes): the
        producer publishes an epoch's files ATOMICALLY (write to a temp
        dir, rename into ``epoch=N/``) before the trigger that picks
        them up — a half-written epoch directory would commit a partial
        epoch whose remainder the ledger would then skip. Kafka-style
        sources don't have this constraint; for file logs it is the
        standard atomic-publish discipline.

        ``trigger`` maps straight to DataStreamWriter.trigger (e.g.
        ``{"availableNow": True}`` to drain the backlog and stop, or
        ``{"processingTime": "10 seconds"}`` for a continuous tail).
        Returns the StreamingQuery; results land in the table + ledger.
        """
        spark = self.spark
        schema = spark.read.parquet(log_dir).schema
        stream = spark.readStream.schema(schema).parquet(log_dir)

        def apply_batch(batch_df, batch_id):
            if not batch_df.head(1):
                return
            self.table.refresh()
            self.run(batch_df, max_inflight=max_inflight,
                     max_coalesce=max_coalesce)

        writer = (stream.writeStream
                  .foreachBatch(apply_batch)
                  .option("checkpointLocation", checkpoint_dir))
        writer = writer.trigger(**(trigger or {"availableNow": True}))
        return writer.start()
