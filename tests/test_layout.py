"""Z-order clustered layout: min/max file pruning on both dimensions."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_lakehouse_medallion_pipeline_spark.sources.io import write_zordered


def _files_overlapping_box(path: str, px, sx) -> tuple[int, int]:
    """(files whose l_partkey/l_suppkey min-max stats overlap the box,
    total files) from parquet footers — what a stats-pruning reader skips."""
    touched, total = 0, 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        pmin = min(md.row_group(g).column(cols["l_partkey"]).statistics.min for g in range(md.num_row_groups))
        pmax = max(md.row_group(g).column(cols["l_partkey"]).statistics.max for g in range(md.num_row_groups))
        smin = min(md.row_group(g).column(cols["l_suppkey"]).statistics.min for g in range(md.num_row_groups))
        smax = max(md.row_group(g).column(cols["l_suppkey"]).statistics.max for g in range(md.num_row_groups))
        total += 1
        if pmax >= px[0] and pmin <= px[1] and smax >= sx[0] and smin <= sx[1]:
            touched += 1
    return touched, total


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    lo_p, hi_p, lo_s, hi_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    # Box covering ~12% of each dimension (~1.5% of the plane).
    px = (lo_p, lo_p + (hi_p - lo_p) // 8)
    sx = (lo_s, lo_s + (hi_s - lo_s) // 8)

    natural = str(tmp_path / "natural")
    li.repartitionByRange(16, "l_orderkey").write.parquet(natural)
    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, ("l_partkey", "l_suppkey"), num_files=16)

    nat_touched, nat_total = _files_overlapping_box(natural, px, sx)
    z_touched, z_total = _files_overlapping_box(zpath, px, sx)
    assert nat_total >= 8 and z_total >= 8
    # Natural (orderkey) layout: part/supp keys are uniform per file, so
    # essentially every file overlaps the box; z-order confines the box
    # to a few curve segments.
    assert z_touched < nat_touched
    assert z_touched <= z_total // 2

    # Layout must not change query results.
    pred = (
        (F.col("l_partkey") >= px[0]) & (F.col("l_partkey") <= px[1])
        & (F.col("l_suppkey") >= sx[0]) & (F.col("l_suppkey") <= sx[1])
    )
    a = {tuple(r) for r in spark.read.parquet(natural).filter(pred).select("l_orderkey", "l_linenumber").collect()}
    b = {tuple(r) for r in spark.read.parquet(zpath).filter(pred).select("l_orderkey", "l_linenumber").collect()}
    assert a == b and len(a) > 0
