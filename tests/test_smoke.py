"""Smoke: session config + parquet round-trip (reference smoke.py, CM:416-448)."""

from __future__ import annotations

from spark_lakehouse_medallion_pipeline_spark.medallion.pipeline import smoke
from spark_lakehouse_medallion_pipeline_spark.sources.io import read_parquet, write_parquet


def test_session_config(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_smoke_roundtrip(spark, tmp_path):
    assert smoke(spark, str(tmp_path)) == 100


def test_parquet_roundtrip_preserves_schema(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "cast(id as double) * 1.5 as v", "uuid() as u")
    path = str(tmp_path / "rt")
    write_parquet(df, path)
    back = read_parquet(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert back.count() == 10


def test_entry_contract(spark):
    """The driver's smoke check: entry() runs and yields >= 0 rows."""
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() >= 0
    qs, oracles = em.queries(), em.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
