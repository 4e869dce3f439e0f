"""applyInPandasWithState per-host tracker: state carries across batches."""

import pytest
from pyspark.sql import functions as F

from breakchecker_spark import schemas
from breakchecker_spark.streaming import stateful
from tests import fixture_web


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sfpages") / "pages")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES).repartition(
        6
    ).write.parquet(path)
    return path


def test_host_rate_tracker_totals(spark, pages_dir, tmp_path):
    stream = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 2)
        .parquet(pages_dir)
    )
    q = (
        stateful.host_rate_tracker(stream)
        .writeStream.format("memory")
        .queryName("hostrates")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per host per touching batch; the LAST
    # emission per host carries the final running totals
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by host order by n_pages desc) rn from hostrates) where rn=1"
    ).collect()
    got = {r["host"]: (r["n_pages"], r["n_bytes"]) for r in rows}

    batch = spark.read.parquet(pages_dir)
    expected = {
        r["host"]: (r["n"], r["b"])
        for r in batch.select(
            F.expr("parse_url(url, 'HOST')").alias("host"),
            F.length("html").cast("long").alias("nb"),
        )
        .groupBy("host")
        .agg(F.count("*").alias("n"), F.sum("nb").alias("b"))
        .collect()
    }
    assert got == expected
    # state genuinely spanned batches: some host saw > maxFilesPerTrigger rows
    assert max(n for n, _ in got.values()) > 2
