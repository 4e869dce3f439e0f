"""Dedup suite + similarity search + text stats operator tests."""

import math

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.operators import dedup, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different content about spark engines"),
        (5, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = dedup.exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]
    kept = {r["doc_id"] for r in dedup.distinct_documents(docs, "doc_id", "text").collect()}
    assert kept == {1, 3, 4, 5}


def test_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_finds_exact_and_near(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", 16, 4).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical signatures always collide
    assert not any(4 in p for p in pairs)


def test_simhash(spark, docs):
    pairs = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=8).collect()
    keyed = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert keyed[(1, 2)] == 0
    if (1, 3) in keyed:
        assert keyed[(1, 3)] > 0


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [0.0, 0.0, 0.95, 0.05], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).cache()


def test_brute_force_topk(spark, vectors):
    top = similarity.brute_force_topk(vectors, vectors.filter(F.col("vec_id") == 1), k=2)
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == [2, 3]
    assert rows[0]["cos"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-5)


def test_lsh_topk_subset_of_exact_scores(spark, vectors):
    approx = similarity.lsh_topk(
        vectors, vectors.filter(F.col("vec_id") == 1), dim=4, k=2, n_planes=2
    ).collect()
    # approximate results must carry exactly-scored cosines
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.brute_force_topk(
            vectors, vectors.filter(F.col("vec_id") == 1), k=10
        ).collect()
    }
    for r in approx:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cos"]


def test_cosine_neardup_pairs_label_block(spark, vectors):
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.cosine_neardup_pairs(
            vectors, block_col="label", threshold=0.9
        ).collect()
    }
    assert (1, 2) in pairs and (4, 5) in pairs
    assert (1, 3) not in pairs  # orthogonal
    assert (2, 4) not in pairs  # different block


def test_cosine_neardup_pairs_lsh_default(spark, vectors):
    """Default LSH blocking: near-identical pairs must collide in at
    least one band; every emitted pair carries its exact cosine."""
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.cosine_neardup_pairs(
            vectors, threshold=0.9, dim=4, n_planes=2, n_bands=8
        ).collect()
    }
    assert (1, 2) in pairs and (4, 5) in pairs
    assert (1, 3) not in pairs  # orthogonal — fails the threshold even if bucketed
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.cosine_neardup_pairs(
            vectors, block_col="label", threshold=0.9
        ).collect()
    }
    for p, c in pairs.items():
        assert exact.get(p, c) == c  # scores are exact, never estimated


def test_simhash64_matches_reference_loop(spark, docs):
    """The vectorized unique-token UDF must equal a direct per-doc loop
    with the documented hash (big-endian md5[:16 hex], ±1 bit votes)."""
    import hashlib

    import numpy as np

    def ref_simhash(t):
        toks = t.lower().split() if t else []
        if not toks:
            return 0
        votes = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
            for p in range(64):
                votes[p] += 1 if (h >> p) & 1 else -1
        fp = 0
        for p in range(64):
            if votes[p] > 0:
                fp |= 1 << p
        return fp if fp < 2**63 else fp - 2**64

    got = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", dedup.simhash64(F.col("text")).alias("fp")
        ).collect()
    }
    want = {r["doc_id"]: ref_simhash(r["text"]) for r in docs.collect()}
    assert got == want


def test_textstats(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick fox and the dog is here with the cat"),
            (2, "der hund und die katze ist nicht hier"),
            (3, "xyzzy qwerty plugh"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in textstats.document_stats(df).collect()}
    assert stats[1]["lang_pred"] == "en"
    assert stats[2]["lang_pred"] == "de"
    assert stats[3]["lang_pred"] == "und"
    assert stats[1]["n_tokens_ws"] == 11
    assert stats[4]["n_tokens_ws"] == 0
    assert 0.0 <= stats[1]["quality"] <= 1.0
    assert stats[1]["quality"] > stats[3]["quality"]
    assert len(stats[1]["fingerprint"]) == 16


def test_fingerprint_rolling_shift_resistant(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "PREFIX a b c d e f g h i j k l"),  # shifted content
            (3, "totally different words here x y z w q r s t"),
        ],
        "doc_id long, text string",
    )
    fp = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", textstats.fingerprint_rolling(F.col("text"), 8).alias("fp")
        ).collect()
    }
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_ivf_topk_exact_scores_and_pruning(spark, vectors):
    """IVF candidates carry exactly-scored cosines, and the search only
    touches the probed cells (a neighbor outside them never appears)."""
    q = vectors.filter(F.col("vec_id") == 1)
    approx = similarity.ivf_topk(
        vectors, q, dim=4, k=3, n_centroids=4, nprobe=2
    ).collect()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.brute_force_topk(vectors, q, k=10).collect()
    }
    assert approx  # probing 2 of 4 cells must yield candidates here
    for r in approx:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cos"]
    # determinism: same call → same rows
    again = similarity.ivf_topk(
        vectors, q, dim=4, k=3, n_centroids=4, nprobe=2
    ).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_ivf_assignment_partitions_corpus(spark, vectors):
    """Every vector lands in exactly one cell; nprobe widens coverage."""
    assign1 = similarity.make_ivf_assign_udf(4, n_centroids=4, nprobe=1)
    assign4 = similarity.make_ivf_assign_udf(4, n_centroids=4, nprobe=4)
    one = vectors.select(assign1("embedding").alias("c")).collect()
    assert all(len(r["c"]) == 1 and 0 <= r["c"][0] < 4 for r in one)
    allc = vectors.select(assign4("embedding").alias("c")).collect()
    assert all(sorted(r["c"]) == [0, 1, 2, 3] for r in allc)


def test_ivf_trained_centroids_recall_not_worse(spark):
    """Trained (spherical k-means) centroids behind the same ivf_topk
    signature: mean per-query recall vs exact top-k must be >= the md5
    quantizer's at identical n_centroids/nprobe (r3 verdict item #8).
    Deterministic: seeded md5 init, Lloyd means over fixed data."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).cache()
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=3).collect()
    }

    def recall(centroids):
        hits = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(
                emb, q, dim=64, k=3, n_centroids=8, nprobe=2, centroids=centroids
            ).collect()
        }
        return len(exact & hits) / len(exact)

    trained = similarity.train_centroids(emb, dim=64, n_centroids=8, n_iters=4)
    r_md5, r_trained = recall(None), recall(trained)
    emb.unpersist()
    assert r_trained >= r_md5
    assert r_trained > 0


def test_jaccard_grid_equals_count_join(spark):
    """r6: the gated small-corpus grid plan must produce exactly the
    count-join's rows (ids, rounded jaccard) on corpora that exercise
    clipped shingles, nulls, duplicates and extreme id values."""
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),
        (3, "a b c d e g"),
        (4, "x"),
        (5, "x"),
        (6, ""),
        (7, None),
        (8, "   "),
        (9, "a b"),
        (10, "a b c"),
        (-(2**62), "p q r s t u"),
        (2**62, "p q r s t u"),
        (0, "p q r s t v"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    grid = dedup._jaccard_grid(docs, "doc_id", "text", 3, 0.5)
    assert grid is not None
    sh = docs.select(
        F.col("doc_id").alias("id"), dedup.shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("shingle"))
    aa = ex.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    bb = ex.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    t = F.lit(0.5)
    counted = (
        aa.join(
            bb,
            (aa["shingle"] == bb["shingle"])
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") * t <= F.col("n_b"))
            & (F.col("n_b") * t <= F.col("n_a")),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ref = counted.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.5)
    a = sorted(map(tuple, grid.collect()))
    b = sorted(map(tuple, ref.collect()))
    assert a == b and len(a) >= 3
    # below the measured ~20k-doc crossover the public gated path
    # stays on the count-join (no grid python stage in its plan)
    public = dedup.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    plan = public._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
