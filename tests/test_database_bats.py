"""Replays of the reference's functional-test bats suites
(tenzir/functional-test/tests/{version,database}.bats) against the
process-default node store:

- version.bats — `show version` emits a version field.
- database.bats "import and export commands" — a suricata import is
  fully visible to a subsequent export (the store is write-through, so
  the bats' explicit `tenzir-ctl flush` durability barrier is a no-op
  here).
- database.bats "parallel imports" — six CONCURRENT import clients
  (4 suricata + 2 zeek-tsv via gzip decompress) land without loss and
  the `count '#schema == /suricata.*/'` / `count '#schema ==
  "zeek.conn"'` tallies match.
- database.bats "batch size" — import batching (--batch-size N ->
  `batch N`) never changes the stored row count, and `-n 242` caps the
  import at exactly 242 events.
"""

import os
import threading

import pytest

REF = "/root/reference/tenzir/integration"
EVE = os.path.join(REF, "data/suricata/eve.json")
CONN_GZ = os.path.join(REF, "data/zeek/conn.log.gz")


def _fresh_store():
    from tenzir_spark.plans.registry import node_store
    node_store().__init__()
    return node_store()


def _count(spark, tql: str) -> int:
    from tenzir_spark.plans.tql import parse_pipeline
    return parse_pipeline(tql, spark=spark).df.count()


def test_show_version(spark):
    # version.bats — `tenzir 'show version'` | jq -e '.version'
    from tenzir_spark.plans.tql import parse_pipeline
    df = parse_pipeline("show version", spark=spark).df
    rows = df.collect()
    assert "version" in df.columns and rows
    assert all(r["version"] for r in rows)


def test_import_and_export_commands(spark):
    # database.bats:27 — read suricata | import; count equals the source
    from tenzir_spark.plans.tql import exec_pipeline
    _fresh_store()
    n_src = _count(spark, f"from {EVE} read suricata")
    exec_pipeline(f"from {EVE} read suricata | import", spark=spark)
    assert _count(spark, "export") == n_src > 0


def test_parallel_imports(spark):
    # database.bats:35 — 4 suricata + 2 zeek import clients racing into
    # one store; per-schema counts and the total must be exact (no lost
    # or duplicated appends under concurrent commits).
    from tenzir_spark.plans.tql import exec_pipeline
    _fresh_store()
    n_suri = _count(spark, f"from {EVE} read suricata")
    zeek_tql = (f"load file {CONN_GZ} | decompress gzip | read zeek-tsv"
                " | import")
    n_zeek = _count(spark,
                    f"load file {CONN_GZ} | decompress gzip | read zeek-tsv")
    errors = []

    def run(tql):
        try:
            exec_pipeline(tql, spark=spark)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=run,
                                args=(f"from {EVE} read suricata | import",))
               for _ in range(4)]
    threads += [threading.Thread(target=run, args=(zeek_tql,))
                for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert _count(spark, 'export | where #schema == /suricata.*/') \
        == 4 * n_suri
    assert _count(spark, 'export | where #schema == "zeek.conn"') \
        == 2 * n_zeek
    assert _count(spark, "export") == 4 * n_suri + 2 * n_zeek


@pytest.mark.parametrize("batch", [10, 1000, 100000])
def test_batch_size_invariance(spark, batch):
    # database.bats:75 — --batch-size must not change what lands
    from tenzir_spark.plans.tql import exec_pipeline
    _fresh_store()
    n_src = _count(spark, f"from {EVE} read suricata")
    exec_pipeline(f"from {EVE} read suricata | batch {batch} | import",
                  spark=spark)
    assert _count(spark, "export") == n_src


def test_import_n_caps_events(spark):
    # database.bats:90 — `import -b --batch-size=1 -n 242 zeek` stores
    # exactly 242 events
    from tenzir_spark.plans.tql import exec_pipeline
    _fresh_store()
    exec_pipeline(f"load file {CONN_GZ} | decompress gzip | read zeek-tsv"
                  " | head 242 | import", spark=spark)
    assert _count(spark, "export") == 242
