"""North-rule end-to-end: change log -> CdcEngine -> lake state ==
pure-Python reference replay; exactly-once under replays; byte-identical
extracted text; schema evolution mid-stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tenzir_spark.cdc import (
    CdcEngine,
    extract_text,
    gen_change_log,
    pages_schema,
    replay,
    salted_deduplicate,
)
from tenzir_spark.lake import LakeTable

N_EVENTS = 6_000
EPOCH_SIZE = 1_000


@pytest.fixture(scope="module")
def change_log(spark):
    df = gen_change_log(
        spark, N_EVENTS, n_domains=20, pages_per_domain=30,
        events_per_epoch=EPOCH_SIZE, schema_change_every=3, seed=42,
    ).cache()
    df.count()
    yield df
    df.unpersist()  # keep the suite-level no-leaked-persists assert honest


@pytest.fixture(scope="module")
def applied(spark, change_log, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake") / "pages")
    table = LakeTable.create(spark, root, pages_schema(), "url", num_buckets=8)
    engine = CdcEngine(spark, table, n_salts=4)
    results = engine.run(change_log)
    return table, engine, results


def _final_state_from_spark(table):
    rows = table.read().collect()
    return {r["url"]: r.asDict() for r in rows}


def test_final_state_equals_reference_replay(spark, change_log, applied):
    table, _, _ = applied
    log_rows = [r.asDict() for r in change_log.collect()]
    expected, columns = replay(log_rows)

    got = _final_state_from_spark(table)
    assert set(got) == set(expected), (
        f"url sets differ: +{list(set(got) - set(expected))[:3]} "
        f"-{list(set(expected) - set(got))[:3]}")
    # compare every column of every row byte-for-byte
    mism = 0
    for url, exp_row in expected.items():
        got_row = got[url]
        for c in columns:
            g, e = got_row.get(c), exp_row.get(c)
            if isinstance(g, bytearray):
                g = bytes(g)
            if c == "warc_ts" and g is not None:
                g = g.replace(tzinfo=None)
            if g != e:
                mism += 1
                assert mism < 5, f"{url}.{c}: {g!r} != {e!r}"
    assert mism == 0


def test_text_invariant_byte_identical(applied):
    """north rule input_hint: byte-identical extracted text per url."""
    table, _, _ = applied
    rows = table.read().select("url", "html", "text").collect()
    assert rows
    for r in rows:
        html = bytes(r.html) if r.html is not None else None
        assert r.text == extract_text(html), r.url


def test_schema_evolution_applied(applied):
    table, _, _ = applied
    names = [f.name for f in table.snapshot.schema.fields]
    assert "crawl_tag_3" in names  # epoch 3 descriptor (every 3rd epoch)
    # rows upserted after the add carry null; column readable everywhere
    table.read().select("crawl_tag_3").collect()


def test_exactly_once_replay_converges(spark, change_log, applied):
    """Re-running every epoch (crash/retry storm) must not change state."""
    table, engine, _ = applied
    before = {r["url"]: r.asDict() for r in table.read().collect()}
    v_before = table.snapshot.version
    results = engine.run(change_log)  # full replay
    assert all(r.get("skipped") for r in results)
    assert table.snapshot.version == v_before
    after = {r["url"]: r.asDict() for r in table.read().collect()}
    assert before.keys() == after.keys()


def test_resume_from_partial(spark, change_log, tmp_path_factory):
    """Apply a prefix, 'crash', resume the whole log: same final state."""
    root = str(tmp_path_factory.mktemp("lake2") / "pages")
    table = LakeTable.create(spark, root, pages_schema(), "url", num_buckets=8)
    engine = CdcEngine(spark, table, n_salts=4)
    engine.apply_epoch(change_log, 0)
    engine.apply_epoch(change_log, 1)
    # resume: new engine instance (fresh process semantics), full run
    table2 = LakeTable.load(spark, root)
    engine2 = CdcEngine(spark, table2, n_salts=4)
    engine2.run(change_log)
    expected, _ = replay([r.asDict() for r in change_log.collect()])
    got = {r["url"] for r in table2.read().collect()}
    assert got == set(expected)


def test_ledger_watermarks_monotone(applied):
    table, _, results = applied
    marks = [e["lsn_watermark"] for e in results if e.get("lsn_watermark") is not None]
    assert marks == sorted(marks)
    cp = table.checkpoints()
    n = cp.select("checkpoint_epoch").distinct().count()
    assert n == N_EVENTS // EPOCH_SIZE


def test_salted_dedup_equals_plain_dedup(spark, change_log):
    from tenzir_spark.operators import deduplicate
    data = change_log.filter("op != 'schema'").select("url", "lsn", "op", "lang")
    a = salted_deduplicate(data, "url", "lsn", n_salts=4)
    b = deduplicate(data, "url", "lsn")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_batches_split_on_rename_gap_and_cap():
    """Coalescing rules: add/widen schema epochs coalesce into a batch
    (adds are epoch-gated in _shape), a RENAME starts a new batch, gaps
    split, and the size cap bounds a run."""
    import json as _json

    eng = CdcEngine.__new__(CdcEngine)  # _batches is pure
    add = _json.dumps({"type": "add", "name": "c", "spark_type": "string"})
    ren = _json.dumps({"type": "rename", "from": "a", "to": "b"})
    wid = _json.dumps({"type": "widen", "name": "n", "spark_type": "bigint"})
    # adds and widens do NOT split
    assert eng._batches([0, 1, 2, 3, 4, 5], {0: [add], 3: [wid]}, 8) == \
        [[0, 1, 2, 3, 4, 5]]
    # renames DO split
    assert eng._batches([0, 1, 2, 3, 4, 5], {3: [ren]}, 8) == \
        [[0, 1, 2], [3, 4, 5]]
    # cap
    assert eng._batches([0, 1, 2, 3, 4, 5], {}, 2) == \
        [[0, 1], [2, 3], [4, 5]]
    # gap (epoch 2 already applied elsewhere) splits the run
    assert eng._batches([0, 1, 3, 4], {}, 8) == [[0, 1], [3, 4]]
    assert eng._batches([], {}, 8) == []


def test_mor_coalesced_ledger_and_resume(spark, change_log, tmp_path_factory):
    """A coalesced batch ledgers EVERY constituent epoch atomically
    (non-final ones marked coalesced_into), replays short-circuit, and a
    mid-log resume after per-epoch applies still converges to replay."""
    root = str(tmp_path_factory.mktemp("lake4") / "pages")
    table = LakeTable.create(spark, root, pages_schema(), "url",
                             num_buckets=8, write_mode="mor")
    engine = CdcEngine(spark, table, n_salts=4)
    # epochs 0,1 applied individually (simulates an earlier serial tail)
    engine.apply_epoch(change_log, 0)
    engine.apply_epoch(change_log, 1)
    results = engine.run(change_log)  # resumes: skips 0,1; coalesces rest
    assert results[0].get("skipped") and results[1].get("skipped")
    ledger = table.snapshot.ledger
    assert all(str(e) in ledger for e in range(6))
    # the pending run [2..5] coalesces into ONE batch (its schema change
    # at epoch 3 is an add, which no longer splits) under epoch 5
    for e in ("2", "3", "4"):
        assert ledger[e]["coalesced_into"] == "5", e
    assert ledger["5"]["coalesced"] == 4
    assert ledger["5"]["rows_applied"] > 0
    # rerun: everything short-circuits, snapshot untouched
    v = table.snapshot.version
    again = engine.run(change_log)
    assert all(r.get("skipped") for r in again)
    assert table.snapshot.version == v
    # final state equals the pure-python replay
    expected, _ = replay([r.asDict() for r in change_log.collect()])
    got = {r["url"] for r in table.read().collect()}
    assert got == set(expected)


def test_coalesced_add_gate_matches_sequential(spark, tmp_path_factory):
    """An event that carries a value for a column BEFORE that column's
    add-epoch is dropped by sequential application (the column isn't in
    the table schema yet). The coalesced batch must drop it identically
    (_shape's added_gate), not resurrect it."""
    import json as _json

    rows = [
        # epoch 0: u1 carries tag='early' — before the add, must vanish
        ("u1", "upsert", 1, 0, "early", None),
        # epoch 1 opens with the add directive, then writes u2
        (None, "schema", 2, 1, None,
         _json.dumps({"type": "add", "name": "tag", "spark_type": "string"})),
        ("u2", "upsert", 3, 1, "late", None),
    ]
    log = spark.createDataFrame(
        rows, "url string, op string, lsn long, epoch int, tag string, "
              "schema_descriptor string")
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
    ])

    def apply(mode_coalesce):
        root = str(tmp_path_factory.mktemp("lakeg") / "t")
        t = LakeTable.create(spark, root, schema, "url", num_buckets=2,
                             write_mode="mor")
        CdcEngine(spark, t, n_salts=2).run(log, max_coalesce=mode_coalesce)
        return {r["url"]: r.asDict() for r in t.read().collect()}

    seq, coal = apply(1), apply(8)
    assert seq == coal
    assert coal["u1"]["tag"] is None      # pre-add value dropped
    assert coal["u2"]["tag"] == "late"    # post-add value kept


def test_mor_final_state_matches_replay(spark, change_log, tmp_path_factory):
    """The merge-on-read path must produce the identical final state."""
    root = str(tmp_path_factory.mktemp("lake3") / "pages")
    table = LakeTable.create(spark, root, pages_schema(), "url",
                             num_buckets=8, write_mode="mor")
    engine = CdcEngine(spark, table, n_salts=4)
    engine.run(change_log)
    expected, columns = replay([r.asDict() for r in change_log.collect()])
    got = {r["url"]: r.asDict() for r in table.read().collect()}
    assert set(got) == set(expected)
    for url, exp in expected.items():
        for c in columns:
            g = got[url].get(c)
            if isinstance(g, bytearray):
                g = bytes(g)
            if c == "warc_ts" and g is not None:
                g = g.replace(tzinfo=None)
            assert g == exp.get(c), f"{url}.{c}"
    # and stays identical after compaction
    table.compact()
    assert {r["url"] for r in table.read().collect()} == set(expected)


def test_footer_and_scan_discovery_identical(spark, change_log,
                                             tmp_path_factory, monkeypatch):
    """r6: run() discovers epochs/row-bounds from parquet footers when
    the log is file-backed (no discovery job, exact checkpointed pass-1
    with the lsn watermark prefilter); non-file logs keep the scan+HLL
    discovery. Both must leave byte-identical final state on the same
    log."""
    import tenzir_spark.cdc.engine as eng_mod
    log_dir = str(tmp_path_factory.mktemp("cdclog") / "log")
    change_log.write.mode("overwrite").partitionBy("epoch").parquet(log_dir)
    plog = spark.read.parquet(log_dir)
    assert eng_mod._epoch_rows_from_footers(plog), "footer path must engage"
    states = []
    for force_scan in (False, True):
        if force_scan:
            monkeypatch.setattr(eng_mod, "_epoch_rows_from_footers",
                                lambda df: None)
        root = str(tmp_path_factory.mktemp(f"lake_f{force_scan}") / "pages")
        table = LakeTable.create(spark, root, pages_schema(), "url",
                                 num_buckets=8, write_mode="mor")
        CdcEngine(spark, table, n_salts=4).run(plog)
        rows = {}
        for r in table.read().collect():
            d = r.asDict()
            rows[d["url"]] = {k: (bytes(v) if isinstance(v, bytearray) else v)
                              for k, v in d.items()}
        states.append(rows)
    assert states[0] and states[0] == states[1]


def test_dedup_bcast_and_fallback_paths_identical(spark, change_log,
                                                  tmp_path_factory,
                                                  monkeypatch):
    """_prepare_mor's two dedup plans (broadcast two-pass vs struct
    max_by fallback) must leave byte-identical final state. The run()
    discovery estimates distinct keys and picks broadcast here; forcing
    the threshold to 0 exercises the at-scale fallback on the same log."""
    states = []
    for thresh in ("1000000", "0"):
        monkeypatch.setenv("TENZIR_SPARK_DEDUP_BCAST_KEYS", thresh)
        root = str(tmp_path_factory.mktemp(f"lake_b{thresh}") / "pages")
        table = LakeTable.create(spark, root, pages_schema(), "url",
                                 num_buckets=8, write_mode="mor")
        CdcEngine(spark, table, n_salts=4).run(change_log)
        rows = {}
        for r in table.read().collect():
            d = r.asDict()
            rows[d["url"]] = {k: (bytes(v) if isinstance(v, bytearray) else v)
                              for k, v in d.items()}
        states.append(rows)
    assert states[0] == states[1]
