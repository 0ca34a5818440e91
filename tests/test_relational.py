"""Unit tests for the relational/preprocessing operators not fully covered
by the oracle-parity gate: CSV strict reads, seeded sampling determinism,
row indexing, rename, histogram totals."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from customer_segmentation_pyspark_spark.operators import preprocess
from customer_segmentation_pyspark_spark.sources import load_table, read_csv_strict
from tests.conftest import SF_SMOKE


def test_read_csv_strict_types(spark, tmp_path):
    """S1: headered CSV + explicit schema -> typed columns in one pass (the
    reference reads everything as string and re-casts per use,
    codeText.txt:12,130)."""
    p = tmp_path / "orders.csv"
    p.write_text("order_id,order_dow,order_hour_of_day\n1,0,9\n2,5,16\n")
    schema = T.StructType(
        [
            T.StructField("order_id", T.IntegerType()),
            T.StructField("order_dow", T.IntegerType()),
            T.StructField("order_hour_of_day", T.IntegerType()),
        ]
    )
    df = read_csv_strict(spark, str(p), schema)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["int"] * 3
    assert df.count() == 2


def test_shuffled_sample_seeded_deterministic(spark):
    """O1/O2: seeded orderBy(rand()).limit(k) is reproducible (the
    reference's unseeded version is not, codeText.txt:53-56)."""
    ev = load_table(spark, SF_SMOKE, "events")
    s1 = [r["event_id"] for r in preprocess.shuffled_sample(ev, 5, seed=7).collect()]
    s2 = [r["event_id"] for r in preprocess.shuffled_sample(ev, 5, seed=7).collect()]
    assert s1 == s2 and len(s1) == 5


def test_with_row_index_unique_and_stable(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    idx = preprocess.with_row_index(ev)
    n = idx.count()
    assert idx.select("row_id").distinct().count() == n


def test_histogram2d_counts_total(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    pts = ev.select(
        preprocess.hour_from_ts(F.col("ts")).alias("hour"), F.col("value")
    )
    hist = preprocess.histogram2d(pts, "hour", "value", xbin=6.0, ybin=50.0)
    assert hist.agg(F.sum("cnt")).collect()[0][0] == ev.count()


def test_dow_bucket_semantics(spark):
    """codeText.txt:26-29: {0,1}->0, {2,3,4}->1, else->2."""
    df = spark.createDataFrame([(d,) for d in range(7)], "dow int")
    got = {
        r["dow"]: r["b"]
        for r in df.select(
            "dow", preprocess.dow_bucket(F.col("dow")).alias("b")
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2}


def test_weekday_name_semantics(spark):
    """codeText.txt:32-41: 0->Monday .. 6->Sunday, else 'None'."""
    df = spark.createDataFrame([(d,) for d in range(8)], "dow int")
    got = {
        r["dow"]: r["w"]
        for r in df.select(
            "dow", preprocess.weekday_name(F.col("dow")).alias("w")
        ).collect()
    }
    assert got[0] == "Monday" and got[6] == "Sunday" and got[7] == "None"


def test_cli_list_is_fast_and_complete():
    """`python -m customer_segmentation_pyspark_spark list` enumerates the
    registry without starting a JVM (pure import path)."""
    from customer_segmentation_pyspark_spark.__main__ import main
    import io
    from contextlib import redirect_stdout

    from customer_segmentation_pyspark_spark.queries import REGISTRY

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["list"])
    assert rc == 0
    lines = [ln for ln in buf.getvalue().splitlines() if ln]
    assert len(lines) == len(REGISTRY)
    assert all("\t" in ln for ln in lines)


def test_map_in_arrow_matches_expression(spark):
    """mapInArrow (the 6th Pandas/Arrow-family member): a pyarrow
    RecordBatch kernel computing byte lengths must equal the JVM
    octet_length expression exactly."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")

    def kernel(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pc.binary_length(b.column(1))],
                ["doc_id", "n_bytes"],
            )

    got = {
        r["doc_id"]: r["n_bytes"]
        for r in d.mapInArrow(kernel, "doc_id long, n_bytes int").collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.octet_length("text").alias("n")
        ).collect()
    }
    assert got == want


def test_pandas_on_spark_api_matches_native(spark):
    """pandas-on-Spark (pyspark.pandas): the drop-in pandas surface must
    produce the same grouped means as the native DataFrame API — the
    migration path for pandas codebases onto the engine."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    c = load_table(spark, SF_SMOKE, "customer")
    native = {
        r["c_mktsegment"]: round(r["m"], 6)
        for r in c.groupBy("c_mktsegment")
        .agg(F.avg("c_acctbal").alias("m"))
        .collect()
    }
    psdf = c.select("c_mktsegment", "c_acctbal").pandas_api()
    got = psdf.groupby("c_mktsegment")["c_acctbal"].mean()
    got_d = {k: round(v, 6) for k, v in got.to_pandas().items()}
    assert got_d == native
