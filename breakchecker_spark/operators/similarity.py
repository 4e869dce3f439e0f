"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: cross join (broadcast
  the query side), JVM-side dot product via zip_with/aggregate, window
  top-k;
* LSH-bucketed ANN — random-hyperplane signatures (deterministic seed)
  shrink the candidate set; same scoring afterwards;
* cosine near-dup pairs with attribute blocking.

Dot products stay in Catalyst (``F.zip_with`` + ``F.aggregate`` —
whole-stage codegen over the arrays); no Python in the scoring path.
At 100 TB the query side is broadcast and the corpus scan is a single
pass — the LSH variant turns the cross join into an equi-join on
bucket signatures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def dot(a, b):
    """JVM-side dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, cos, rank).

    The query side is broadcast — the corpus is scanned once however
    large it is. Ties break on neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """md5-derived hyperplane matrix, uniform in [-1, 1).

    ``w[p][d] = int(md5(f"{seed}:{p}:{d}")[:8 hex], 16) / 2^31 - 1`` —
    reproducible in any engine with md5 (the DuckDB oracle re-derives
    the identical matrix in SQL), so LSH bucket assignments are exact-
    checkable, not just recall-checkable. Sign projections only need a
    symmetric-about-zero distribution, so uniform serves as well as
    gaussian here (same construction trade as minhash, dedup.py:17-21).
    """
    import hashlib

    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16)
            w[p, d] = h / 2147483648.0 - 1.0
    return w


def make_lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Vectorized random-hyperplane signature: array<float> → int bucket."""
    planes = deterministic_planes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def signature(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        bits = (mat @ planes.T) > 0
        out = np.zeros(len(vecs), dtype=np.int64)
        for i in range(n_planes):
            out |= bits[:, i].astype(np.int64) << i
        return pd.Series(out.astype("int32"))

    return signature


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket.

    Recall trades with n_planes; scoring identical to brute force on
    the bucket-joined candidates. The cross join becomes an equi-join
    on the signature — the 100 TB scale path.
    """
    sig = make_lsh_signature_udf(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", sig(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", sig(F.col("cv")))
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def deterministic_centroids(dim: int, n_centroids: int, seed: int = 42) -> np.ndarray:
    """md5-derived IVF coarse-quantizer centroids, uniform in [-1, 1).

    ``w[c][d] = int(md5(f"ivf{seed}:{c}:{d}")[:8 hex], 16) / 2^31 - 1``
    — the same SQL-reproducible construction as the LSH planes, so the
    DuckDB oracle re-derives cell ASSIGNMENTS exactly. Production
    swaps in trained k-means centroids; the partition-pruned search
    shape (assign → probe nprobe cells → exact-score within) is
    identical either way.
    """
    import hashlib

    w = np.empty((n_centroids, dim), dtype=np.float64)
    for c in range(n_centroids):
        for d in range(dim):
            h = int(hashlib.md5(f"ivf{seed}:{c}:{d}".encode()).hexdigest()[:8], 16)
            w[c, d] = h / 2147483648.0 - 1.0
    return w


def train_centroids(
    corpus: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means (Lloyd) coarse quantizer, fully distributed.

    Deterministic: initialized from the md5 centroids (no sampling),
    each iteration assigns every vector to its nearest cell (the same
    Arrow UDF the search path uses) and recomputes means JVM-side —
    ``posexplode`` + ``groupBy(cell, pos).avg`` is one shuffle of
    n_vectors×dim scalar rows with map-side partial aggregation; only
    the n_centroids×dim means reach the driver per iteration. Cells
    that lose all members keep their previous centroid. Trained
    centroids plug into :func:`ivf_topk` via ``centroids=``; the
    oracle-gated default stays md5 (SQL-re-derivable)."""
    cents = deterministic_centroids(dim, n_centroids, seed)
    for _ in range(n_iters):
        assign = make_ivf_assign_udf(dim, n_centroids, seed, 1, centroids=cents)
        means = (
            corpus.select(assign(F.col(vec_col))[0].alias("cell"), vec_col)
            .select("cell", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in means:
            new[r["cell"], r["pos"]] = r["m"]
        cents = new
    return cents


def make_ivf_assign_udf(
    dim: int,
    n_centroids: int = 8,
    seed: int = 42,
    nprobe: int = 1,
    centroids: np.ndarray | None = None,
):
    """array<float> → the vector's ``nprobe`` nearest cells (array<int>).

    Score = round(dot(v, c)/|c|, 6) — cosine up to the per-vector
    constant |v|, which cannot change the ranking; rounding to 6
    decimals BEFORE ranking pins cross-engine float ties (numpy dot vs
    SQL sum ordering). Ties break on ascending centroid id.

    ``centroids`` overrides the md5 construction (e.g. k-means output
    from :func:`train_centroids`); the scoring/rank pin is identical.
    """
    cents = (
        centroids
        if centroids is not None
        else deterministic_centroids(dim, n_centroids, seed)
    )
    norms = np.linalg.norm(cents, axis=1)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        # dot first, divide after — the exact expression the SQL oracle
        # rounds (dot(v,c)/|c|), keeping the 6-decimal pin aligned
        sims = np.round((mat @ cents.T) / norms[None, :], 6)
        # stable argsort of -sims keeps ascending centroid id on ties
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into cells, probe only
    the query's ``nprobe`` nearest cells, exact-score within.

    The 100 TB shape: the corpus is written partitioned by cell
    (Iceberg partition transform on the assignment), a query touches
    nprobe/n_centroids of the data, and the cross join becomes an
    equi-join on cell — recall trades with nprobe instead of planes.

    ``centroids``: trained quantizer (see :func:`train_centroids`) —
    same search shape, better-balanced cells; default md5 centroids
    keep the DuckDB oracle able to re-derive assignments.
    """
    assign_q = make_ivf_assign_udf(dim, n_centroids, seed, nprobe, centroids)
    assign_c = make_ivf_assign_udf(dim, n_centroids, seed, 1, centroids)
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("cell", F.explode(assign_q(F.col("qv"))))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cell", assign_c(F.col("cv"))[0])
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def make_lsh_bands_udf(dim: int, n_planes: int = 4, n_bands: int = 8, seed: int = 42):
    """Banded hyperplane signatures: array<float> → array<int> (one
    bucket per band). A pair is a candidate if ANY band matches —
    recall = 1 - (1 - p^n_planes)^n_bands where p = 1 - θ/π, the
    classic banding amplification (same shape as minhash LSH)."""
    planes = deterministic_planes(dim, n_planes * n_bands, seed)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bands(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        bits = (mat @ planes.T) > 0  # (n, n_planes*n_bands)
        out = []
        for row in bits:
            sigs = []
            for b in range(n_bands):
                s = 0
                for j in range(n_planes):
                    s |= int(row[b * n_planes + j]) << j
                sigs.append(s)
            out.append(sigs)
        return pd.Series(out)

    return bands


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 4,
    n_bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    Default blocking is banded hyperplane LSH (the 100 TB path: the
    all-pairs join becomes an equi-join on (band, bucket); block sizes
    are bounded by the bucket granularity, not by attribute
    cardinality). Pass ``block_col`` to opt into attribute blocking —
    exact *within* blocks but unbounded per-block cost if a block is
    huge. Candidate generation shuffles only (id, band, sig) rows;
    vectors are joined back for scoring on the (much smaller) distinct
    candidate set, and every emitted pair carries its exact cosine.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if block_col:
        blocked = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.col(block_col).alias("blk"),
        )
        a, b = blocked.alias("a"), blocked.alias("b")
        return (
            a.join(b, (F.col("a.id") < F.col("b.id")) & (F.col("a.blk") == F.col("b.blk")))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
            )
            .filter(F.col("cos") >= threshold)
        )

    if dim is None:
        raise ValueError("dim is required for LSH blocking (block_col=None)")
    bands = make_lsh_bands_udf(dim, n_planes, n_bands, seed)
    sigs = base.select(
        "id", F.posexplode(bands(F.col("v"))).alias("band", "sig")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(base.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
