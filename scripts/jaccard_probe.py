"""Phase decomposition for dedup_jaccard_pairs (guide §1): time each
stage of the AllPairs plan separately with noop sinks so the 122 s at
sf1.0 can be attributed to shingling / dfreq / prefix / candidate join /
verification rather than guessed.

Usage: python scripts/jaccard_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from breakchecker_spark.operators import dedup
from breakchecker_spark.session import get_spark


def t(label, df, mode="noop"):
    spark = df.sparkSession
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    if mode == "noop":
        df.write.format("noop").mode("overwrite").save()
        n = None
    else:
        n = df.count()
    dt = time.time() - t0
    print(f"{label:28s} {dt:8.2f}s rows={n}")
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark(app_name="jprobe", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)

    threshold = 0.5
    sh = docs.select(F.col("doc_id").alias("id"),
                     dedup.shingles(F.col("text"), 3).alias("sh")).withColumn(
        "n_sh", F.size("sh"))
    # warm
    t("warm shingles", sh)
    t("shingles noop", sh)
    sh_p = sh.persist()
    t("persist shingles (count)", sh_p, mode="count")

    exploded = sh_p.select("id", F.explode("sh").alias("shingle"))
    t("explode noop", exploded)
    dfreq = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
    t("dfreq (count)", dfreq, mode="count")

    ranked = exploded.join(F.broadcast(dfreq), "shingle")
    prefix_len = (F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + F.lit(1)).cast("int")
    prefix = (
        ranked.groupBy("id")
        .agg(F.count("*").cast("int").alias("n_sh"),
             F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("ord"))
        .select("id", "n_sh",
                F.explode(F.slice("ord", F.lit(1), prefix_len)).alias("p"))
        .select("id", "n_sh", F.col("p.shingle").alias("shingle"))
    )
    prefix_p = prefix.persist()
    t("prefix rows (count)", prefix_p, mode="count")

    a, b = prefix_p.alias("a"), prefix_p.alias("b")
    cand = (
        a.join(b,
               (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id"))
               & (F.col("b.n_sh") * F.lit(threshold) <= F.col("a.n_sh"))
               & (F.col("a.n_sh") * F.lit(threshold) <= F.col("b.n_sh")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    t("candidates raw (count)", cand, mode="count")
    cand_d = cand.dropDuplicates(["id_a", "id_b"]).persist()
    t("candidates dedup (count)", cand_d, mode="count")

    sets = sh_p.select("id", "sh", "n_sh")

    def _side(suffix):
        s = sets.select(F.col("id").alias(f"id_{suffix}"),
                        F.col("sh").alias(f"sh_{suffix}"),
                        F.col("n_sh").alias(f"n_{suffix}"))
        return F.broadcast(s)

    verified = (cand_d.join(_side("a"), "id_a").join(_side("b"), "id_b")
                .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b"))))
    out = verified.select(
        "id_a", "id_b",
        F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    t("verify+filter noop", out)
    t("verify+filter noop again", out)


if __name__ == "__main__":
    main()
