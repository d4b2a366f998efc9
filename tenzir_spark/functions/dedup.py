"""Deduplication family for web-scale corpora.

Four tiers, each with its scale story:

- exact: hash-groupBy — one shuffle with map-side combine.
- MinHash + LSH: shingle -> n minhashes -> b bands -> bucket self-join.
  Candidate generation touches only same-band-bucket pairs, so cost is
  O(sum bucket^2) not O(n^2) — the standard 100 TB near-dup design
  (Broder '97 / MMDS ch.3).
- SimHash: 64-bit signature via numpy in an Arrow UDF; Hamming-ball
  grouping by signature bands.
- n-gram Jaccard: exact verification on candidate pairs only.

All hashing uses xxhash64(col, seed) (JVM) so results are deterministic
and identical across runs/cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, cols: list[str], keep_col: str | None = None) -> DataFrame:
    """One row per distinct value of ``cols``; with ``keep_col`` keeps the
    row minimizing it (deterministic), else an arbitrary-but-single row."""
    if keep_col is None:
        return df.dropDuplicates(cols)
    others = [c for c in df.columns if c not in cols]
    agg = F.min_by(F.struct(*[F.col(c) for c in others]), F.col(keep_col))
    out = df.groupBy(*cols).agg(agg.alias("__r"))
    return out.select(*cols, *[F.col(f"__r.{c}").alias(c) for c in others])


# ---------------------------------------------------------------- shingles


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct k-char shingles of a string (JVM-side array expr)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - F.lit(k - 1)
    # sequence(1, 0) counts DOWN to [1, 0] — guard short/empty strings
    return F.when(n >= 1, F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k))
    )).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")
    n = F.size(toks) - F.lit(k - 1)
    return F.when(n >= 1, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------- minhash


def minhash_signature(shingles: Column, n_hashes: int = 64, seed: int = 1) -> Column:
    """Array of n minhashes: min over xxhash64(shingle, seed+i). Empty
    shingle sets get nulls (excluded from candidates)."""
    sigs = [
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(seed + i))))
        for i in range(n_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 1,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with their estimated
    Jaccard (fraction of agreeing minhashes).

    Pipeline: signature -> split into ``bands`` bands -> hash each band ->
    explode -> self-join on (band_idx, band_hash) -> distinct pairs ->
    estimate. The self-join is an equi-join on the band key: Spark
    shuffles both sides by band hash, so work is proportional to bucket
    sizes (degenerate giant buckets — e.g. empty docs — are the caller's
    filter responsibility; we drop null/empty texts)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(char_shingles(text_col, shingle_k), n_hashes, seed)
    with_sig = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        .filter(F.col(text_col).isNotNull() & (F.length(text_col) >= shingle_k))
        .withColumn("__sig", sig)
    )
    band = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band))
                 .alias("bhash"),
            ),
        )
    )
    banded = with_sig.select("__id", "__sig", band.alias("__b"))
    left = banded.select(
        F.col("__b"), F.col("__id").alias("id_a"), F.col("__sig").alias("sig_a"))
    right = banded.select(
        F.col("__b"), F.col("__id").alias("id_b"), F.col("__sig").alias("sig_b"))
    pairs = (
        left.join(right, "__b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
            lambda x: x,
        )
    )
    return pairs.select(
        "id_a", "id_b",
        (agree.cast("double") / F.lit(float(n_hashes))).alias("est_jaccard"),
    )


# ---------------------------------------------------------------- jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    use_words: bool = True,
) -> DataFrame:
    """EXACT Jaccard similarity over k-gram sets for all pairs sharing at
    least one gram (inverted-index self-join — never materializes the full
    n^2). Returns pairs >= threshold.

    Scale path: run minhash_lsh_candidates first and verify only those;
    this operator IS the verifier when given a pre-filtered df."""
    sh = word_shingles(text_col, k) if use_words else char_shingles(text_col, k)
    base = (
        df.select(F.col(id_col).alias("__id"), sh.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .withColumn("__n", F.size("__sh"))
    )
    inv = base.select("__id", "__n", F.explode("__sh").alias("__g"))
    a = inv.select(F.col("__g"), F.col("__id").alias("id_a"), F.col("__n").alias("n_a"))
    b = inv.select(F.col("__g"), F.col("__id").alias("id_b"), F.col("__n").alias("n_b"))
    inter = (
        a.join(b, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- simhash

_SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Charikar '02), vectorized
    with numpy per Arrow batch. Token hash = first 8 bytes of blake2b
    (deterministic across processes, unlike Python hash())."""
    import hashlib

    def one(s):
        if s is None:
            return None
        toks = s.split()
        if not toks:
            return 0
        hashes = np.frombuffer(
            b"".join(hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest() for t in toks),
            dtype=np.uint64,
        )
        bits = ((hashes[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1).astype(np.int32)
        v = np.where(bits.sum(axis=0) * 2 >= len(toks), 1, 0).astype(np.uint64)
        return int((v << np.arange(_SIMHASH_BITS, dtype=np.uint64)).sum().astype(np.int64))

    return text.map(one)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      band_bits: int = 16) -> DataFrame:
    """Near-dup candidate pairs whose simhash agrees on at least one of
    the 64/band_bits bands (standard Hamming-LSH: any pair within
    ~(64/band_bits - 1) bit flips shares a band w.h.p.). Returns pairs
    with exact Hamming distance."""
    n_bands = _SIMHASH_BITS // band_bits
    with_sh = df.select(F.col(id_col).alias("__id"),
                        simhash_udf(F.col(text_col)).alias("__sh"))
    bandcol = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col("__sh"), i * band_bits)
                      .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("bhash"))
            for i in range(n_bands)
        ])
    )
    banded = with_sh.select("__id", "__sh", bandcol.alias("__b"))
    a = banded.select("__b", F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = banded.select("__b", F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    pairs = (
        a.join(b, "__b").filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming"))
