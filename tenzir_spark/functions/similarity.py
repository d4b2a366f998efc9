"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, one scan, JVM-side arithmetic
  (zip_with + aggregate), TakeOrderedAndProject for the top-k — no Python.
- LSH-bucketed ANN (random hyperplanes): the scale path — signature
  equi-join prunes the candidate set before exact re-scoring, turning a
  full-corpus scan per query into a bucket lookup.
- embedding near-dup: all pairs with cosine >= threshold via the same LSH
  bucketing (self-join).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The plan is scan -> project(score) -> TakeOrderedAndProject(k): each
    partition keeps its local top-k, the driver merges — no shuffle of the
    corpus. This is the correct 100 TB brute-force shape."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def auto_planes(n_rows: int, target_bucket: int = 128,
                lo: int = 6, hi: int = 20) -> int:
    """Corpus-aware plane count: ``n_planes = ceil(log2(n/target_bucket))``.

    Random hyperplanes split the corpus into 2^b buckets, so the EXPECTED
    bucket size is n/2^b; solving for ~``target_bucket`` keeps the exact
    re-score cost per probe roughly constant as the corpus grows. A fixed
    b (the old default 6 = 64 buckets) degrades toward brute force at
    corpus scale: 10^9 vectors / 64 buckets = 16M candidates per probe.
    Clamped to [lo, hi]: below 2^lo buckets LSH isn't pruning anything
    worth the plan complexity, above ``hi`` the multiprobe neighborhood
    (O(b^2) probes at 2 bits) and per-table recall start to suffer —
    raise ``n_tables`` instead of going past it."""
    if n_rows <= 0:
        return lo
    need = math.ceil(math.log2(max(n_rows / float(target_bucket), 2.0)))
    return max(lo, min(hi, int(need)))


def _signature_pandas_udf(planes: list[list[float]]):
    """Arrow-batched signature: one numpy matmul per batch against the
    plane matrix (closed over — shipped once per task, not inlined into
    the plan). At real embedding dims (768-1536) the literal-expression
    path would put tens of thousands of literal nodes into the Catalyst
    plan and run n_planes sequential F.aggregate folds per row; the
    matmul is one BLAS call."""
    mat = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    shifts = np.arange(mat.shape[0], dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        mask = vecs.notna()
        out = np.zeros(len(vecs), dtype=np.int64)
        if mask.any():
            arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[mask]])
            bits = (arr @ mat.T) >= 0  # (batch, n_planes)
            out[mask.to_numpy()] = (
                (bits.astype(np.uint64) << shifts).sum(axis=1).astype(np.int64))
        return pd.Series(out).where(mask)

    return sig


def lsh_signature(vec_col: Column, planes: list[list[float]],
                  use_udf: bool | None = None) -> Column:
    """Random-hyperplane signature: bit i = sign(v . h_i), packed to long.

    Small dim*planes products stay as pure Column expressions (codegen'd,
    no Python); past ~512 literal coefficients the vectorized pandas-UDF
    matmul wins (plan stays tiny, Arrow batches amortize the transfer)."""
    if use_udf is None:
        use_udf = len(planes) * len(planes[0]) >= 512
    if use_udf:
        return _signature_pandas_udf(planes)(vec_col)
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(x) for x in h])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for h in planes
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(1 << i))
    return sig


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    seed: int = 7,
    multiprobe_bits: int = 2,
    n_tables: int = 4,
    corpus_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: OR-amplified random-hyperplane LSH.

    ``n_tables`` independent hash tables (different plane seeds), each
    probed at the query's bucket plus all buckets within
    ``multiprobe_bits`` Hamming distance; the candidate union is exactly
    re-scored. Recall grows as 1-(1-p^b)^L while the scanned fraction
    stays ~L * probes / 2^b — the standard scale/recall dial (Indyk &
    Motwani '98; multiprobe: Lv et al. '07).

    ``n_planes`` defaults to corpus-aware sizing (``auto_planes``:
    b = ceil(log2(n/128)), clamped to [6, 20]) so expected bucket size —
    and hence exact re-score cost per probe — stays ~constant as the
    corpus grows. Pass ``corpus_size`` (e.g. from table metadata) to skip
    the count job; for parquet sources the count is footer-metadata-only
    anyway."""
    if n_planes is None:
        if corpus_size is None:
            corpus_size = df.count()
        n_planes = auto_planes(corpus_size)
    dim = len(query)
    vec = F.col(vec_col).cast("array<double>")
    pred = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qsig = 0
        for i, h in enumerate(planes):
            if sum(a * b for a, b in zip(query, h)) >= 0:
                qsig |= 1 << i
        probes = {qsig}
        if multiprobe_bits >= 1:
            for i in range(n_planes):
                probes.add(qsig ^ (1 << i))
        if multiprobe_bits >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add(qsig ^ (1 << i) ^ (1 << j))
        hit = lsh_signature(vec, planes).isin([int(s) for s in probes])
        pred = hit if pred is None else (pred | hit)
    cand = df.select(F.col(id_col), vec.alias("__v")).filter(pred)
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(F.col(id_col), cosine(F.col("__v"), q).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def ivf_centroids(df: DataFrame, n_centroids: int = 64,
                  vec_col: str = "embedding", sample: int = 8192,
                  iters: int = 10, seed: int = 1) -> "np.ndarray":
    """Train IVF coarse centroids: k-means on a bounded driver-side
    sample of L2-NORMALIZED vectors (spherical k-means, so euclidean
    assignment == cosine assignment). The sample is fixed-size
    regardless of corpus scale — at 100 TB the train step stays O(sample
    x dim x iters) on the driver while everything else is distributed,
    the standard IVF recipe (Jégou et al., PAMI '11)."""
    rows = (df.select(F.col(vec_col).cast("array<double>").alias("v"))
            .rdd.takeSample(False, sample, seed))
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)),
                        replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_assign(df: DataFrame, centroids: "np.ndarray",
               vec_col: str = "embedding",
               cell_col: str = "ivf_cell") -> DataFrame:
    """Add each vector's nearest-centroid cell id — one broadcast numpy
    matmul per Arrow batch (the centroid matrix ships once per executor
    inside the UDF closure; no join, no shuffle). Persist the result
    partitioned by ``cell_col`` to make probe queries partition-pruned
    reads."""
    cent = np.asarray(centroids, dtype=np.float64)
    # normalize so argmax(dot) == argmax(cosine) regardless of whether
    # the caller's centroids were unit vectors
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True),
                             1e-12)

    @F.pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int32))

    return df.withColumn(cell_col, cell(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 32,
    nprobe: int = 8,
    sample: int = 8192,
    seed: int = 1,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` cells whose centroids
    are nearest the query, exact-rescore only their members.

    The scanned fraction is ~nprobe/n_centroids of the corpus; recall is
    the usual IVF dial (raise nprobe toward n_centroids for exactness).
    Pass a precomputed ``centroids`` (ivf_centroids) to amortize training
    across queries; production deployments persist ``ivf_assign`` output
    partitioned by cell so the probe filter becomes partition pruning at
    the source instead of a scan-time filter."""
    cent = np.asarray(centroids, dtype=np.float64) if centroids is not None \
        else ivf_centroids(df, n_centroids, vec_col, sample, seed=seed)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True),
                             1e-12)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cent @ qn))[:nprobe].tolist()
    assigned = ivf_assign(df, cent, vec_col)
    cand = assigned.filter(F.col("ivf_cell").isin([int(p) for p in probes]))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), qlit).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 14,
    seed: int = 7,
    mode: str = "auto",
    corpus_size: int | None = None,
    exact_cap: int = 20_000,
    n_tables: int = 4,
) -> DataFrame:
    """All pairs with cosine >= threshold — embedding-space near-dup
    detection (the cosine member of the exact/minhash/simhash/ngram
    dedup family in functions/dedup.py).

    Two physical plans behind one semantic contract:

    - ``exact``: broadcast nested-loop self-join on ``id_a < id_b`` with
      the dot product as a JVM ``zip_with``/``aggregate`` fold over
      pre-computed norms — no Python, no shuffle of the corpus (the
      build side ships once per executor), and EXACT output, which makes
      it the oracle baseline. O(n^2) pairs — the wall is arithmetic,
      not memory: n rows cost n^2/2 dot-folds of length dim (20k rows =
      2x10^8 folds, seconds across a cluster; 200k = 2x10^10, hours),
      while the broadcast build side is only n*(dim+2)*8 bytes (~10 MB
      at the default cap for dim 64). Hence the row gate ``exact_cap``:
      right for a dedup batch / entity block / IVF cell, not a full
      corpus.
    - ``lsh``: candidates bucketed by random-hyperplane signature across
      ``n_tables`` independent tables (OR-amplified, like ann_topk_lsh),
      then exact re-score + cross-table pair dedup. One shuffle per
      table (signature equi-join). Per-table recall for a pair at angle
      theta is (1 - theta/pi)^n_planes; OR across L tables lifts it to
      1 - (1 - p)^L — e.g. ~2deg pairs at 14 planes: 84% one table, 99.9%
      at four. Near 1 only for genuinely-near pairs (cosine >= ~0.9).
      This is the 100 TB path: at true near-dup thresholds the misses
      are the pairs that barely qualify; for low thresholds (broad
      similarity mining) LSH is the wrong tool — use the IVF cells or
      the exact mode per block.

    ``auto`` picks exact under ``exact_cap`` rows (pass ``corpus_size``
    to skip the count job; parquet counts are footer-only) and lsh
    above."""
    if mode == "auto":
        if corpus_size is None:
            corpus_size = df.count()
        mode = "exact" if corpus_size <= exact_cap else "lsh"
    vec = F.col(vec_col).cast("array<double>")
    if mode == "exact":
        base = df.select(F.col(id_col).alias("__id"), vec.alias("__v"),
                         norm(vec).alias("__n"))
        a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("v_a"),
                        F.col("__n").alias("n_a"))
        b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("v_b"),
                        F.col("__n").alias("n_b"))
        pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        return (pairs.select("id_a", "id_b", cos.alias("cosine"))
                .filter(F.col("cosine") >= threshold))
    dim_row = df.select(F.size(vec_col)).first()
    out = None
    for t in range(max(1, n_tables)):
        planes = _hyperplanes(dim_row[0], n_planes, seed + 1000 * t)
        base = df.select(F.col(id_col).alias("__id"), vec.alias("__v"),
                         lsh_signature(vec, planes).alias("__sig"))
        a = base.select("__sig", F.col("__id").alias("id_a"),
                        F.col("__v").alias("v_a"))
        b = base.select("__sig", F.col("__id").alias("id_b"),
                        F.col("__v").alias("v_b"))
        pairs = a.join(b, "__sig").filter(F.col("id_a") < F.col("id_b"))
        scored = (pairs.select("id_a", "id_b",
                               cosine(F.col("v_a"), F.col("v_b")).alias("cosine"))
                  .filter(F.col("cosine") >= threshold))
        out = scored if out is None else out.unionByName(scored)
    return out.dropDuplicates(["id_a", "id_b"])
