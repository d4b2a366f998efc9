"""Deterministic synthetic CDC change log + base pages, generated
DISTRIBUTEDLY with pure Column expressions.

Every column derives from the row id via xxhash64 — no Python RNG, no
driver-side materialization — so the generator itself scales to the
10^10-event tier (spark.range is a parallel source) and two runs with the
same seed are bit-identical, which the replay-equality tests rely on.

Shape per FIXTURES.md §A2: ordered (lsn, op, url, payload, epoch) with
Zipf-skewed domains (hot-domain skew is the north rule's salting test),
multiple changes per url across epochs, interleaved deletes, and periodic
Avro-style schema-evolution descriptor events.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "zh", "ja", "pt", "ru"]
WORDS = [
    "data", "stream", "page", "crawl", "index", "query", "merge", "batch",
    "table", "event", "log", "key", "value", "shard", "split", "join",
    "spark", "delta", "upsert", "schema", "text", "html", "link", "node",
]


def _h(col, salt: int, seed: int):
    return F.xxhash64(col, F.lit(salt), F.lit(seed))


def _pick(arr: list[str], col, salt: int, seed: int):
    return F.element_at(F.array(*[F.lit(x) for x in arr]),
                        (F.pmod(_h(col, salt, seed), F.lit(len(arr))) + 1).cast("int"))


def gen_change_log(
    spark: SparkSession,
    n_events: int,
    n_domains: int = 50,
    pages_per_domain: int = 200,
    events_per_epoch: int = 10_000,
    zipf_alpha: float = 3.0,
    delete_pct: int = 10,
    schema_change_every: int = 4,
    seed: int = 42,
    first_op_insert: bool = True,
) -> DataFrame:
    """Ordered change log: lsn == row id (strictly increasing, gapless),
    epoch = lsn // events_per_epoch (contiguous micro-batches).

    Domain skew: uniform u^alpha concentrates urls in low domain ids —
    domain 0 receives ~(1/n)^(1/alpha) of all traffic, the "hot domain".
    """
    df = spark.range(n_events).withColumnRenamed("id", "lsn")
    u = (F.pmod(_h(F.col("lsn"), 1, seed), F.lit(1_000_000)).cast("double") / 1_000_000.0)
    domain = F.floor(F.pow(u, F.lit(zipf_alpha)) * n_domains).cast("int")
    page = F.pmod(_h(F.col("lsn"), 2, seed), F.lit(pages_per_domain))
    df = df.withColumn(
        "url",
        F.concat(F.lit("https://d"), domain.cast("string"),
                 F.lit(".example.com/p/"), page.cast("string")),
    )
    df = df.withColumn("epoch", (F.col("lsn") / events_per_epoch).cast("int"))

    # op: first change to a url is an insert; later ones update or delete.
    # The row_number window is generation-time-only cosmetics (merge
    # treats insert/update both as upsert); first_op_insert=False skips
    # the window so generation is a pure map — the shape that actually
    # scales to 10^10 rows (used by bench/scaling runs).
    is_del = F.pmod(_h(F.col("lsn"), 3, seed), F.lit(100)) < delete_pct
    if first_op_insert:
        from pyspark.sql import Window
        rn = F.row_number().over(Window.partitionBy("url").orderBy("lsn"))
        op = (
            F.when(rn == 1, F.lit("insert"))
            .when(is_del, F.lit("delete"))
            .otherwise(F.lit("update"))
        )
    else:
        op = F.when(is_del, F.lit("delete")).otherwise(F.lit("update"))
    df = df.withColumn("op", op)

    # payload: content derives from lsn so every update really changes the
    # row; html embeds the text so extraction is verifiable byte-for-byte.
    n_words = (F.pmod(_h(F.col("lsn"), 4, seed), F.lit(12)) + 4).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in WORDS]),
            (F.pmod(F.xxhash64(F.col("lsn"), i, F.lit(seed)), F.lit(len(WORDS))) + 1).cast("int"),
        ),
    )
    body = F.array_join(words, " ")
    html = F.concat(
        F.lit("<html><head><title>"), F.col("url"), F.lit("</title>"),
        F.lit("<script>var x=1;</script></head><body><p>"),
        body, F.lit("</p></body></html>"),
    )
    df = (
        df.withColumn("warc_ts", F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")))
        .withColumn("html", F.when(F.col("op") != "delete", html.cast("binary")))
        .withColumn("lang", F.when(F.col("op") != "delete", _pick(LANGS, F.col("lsn"), 5, seed)))
        .withColumn("warc_ts", F.when(F.col("op") != "delete", F.col("warc_ts")))
    )

    # schema-evolution descriptor events: one synthetic 'schema' row at the
    # start of every k-th epoch (Avro-style JSON directive).
    n_epochs = (n_events + events_per_epoch - 1) // events_per_epoch
    desc_rows = []
    for e in range(n_epochs):
        if e > 0 and e % schema_change_every == 0:
            desc = {"type": "add", "name": f"crawl_tag_{e}", "spark_type": "string"}
            desc_rows.append((int(e) * events_per_epoch, "schema", None, int(e), json.dumps(desc)))
    desc_df = spark.createDataFrame(
        desc_rows, "lsn long, op string, url string, epoch int, schema_descriptor string"
    ) if desc_rows else None

    df = df.withColumn("schema_descriptor", F.lit(None).cast("string"))
    if desc_df is not None:
        desc_full = (
            desc_df.withColumn("warc_ts", F.lit(None).cast("timestamp"))
            .withColumn("html", F.lit(None).cast("binary"))
            .withColumn("lang", F.lit(None).cast("string"))
        )
        # descriptor rows share the epoch's first lsn; engine applies them
        # before data rows of the same epoch.
        df = df.unionByName(desc_full.select(df.columns))
    return df


def pages_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
