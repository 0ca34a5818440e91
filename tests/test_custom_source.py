"""Custom Python DataSource: parallel partitions, deterministic output,
full integration with downstream engine operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources.synthetic import (
    SyntheticDocsSource,
)


def _read(spark, n_docs=500, n_partitions=8):
    spark.dataSource.register(SyntheticDocsSource)
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", n_partitions)
        .load()
    )


def test_custom_source_rows_and_determinism(spark):
    df1 = _read(spark)
    assert df1.count() == 500
    assert df1.select("doc_id").distinct().count() == 500
    r1 = sorted(map(tuple, df1.collect()))
    r2 = sorted(map(tuple, _read(spark).collect()))
    assert r1 == r2
    assert df1.rdd.getNumPartitions() == 8


def test_custom_source_feeds_engine_operators(spark):
    from customer_segmentation_pyspark_spark.operators import textops

    df = _read(spark, n_docs=200, n_partitions=4)
    counts = textops.token_count(F.col("text"))
    got = df.select((counts == F.col("n_tokens")).alias("ok")).collect()
    assert all(r["ok"] for r in got)
    # chunking runs straight off the custom source
    chunks = textops.chunk_documents(df)
    assert chunks.count() >= 200
