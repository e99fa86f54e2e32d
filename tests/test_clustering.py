"""kmeans_int_2d hand-traced fixtures: seeds, ties, empty clusters,
fewer-rows-than-k clamp, empty input, k-validation."""

from __future__ import annotations

import pytest

from spark_lakehouse_medallion_pipeline_spark.operators.clustering import kmeans_int_2d


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_kmeans_two_clusters_hand_traced(spark):
    """Seeds = 2 smallest ids (0,0) and (10,0); round 1 assigns
    {0,1,2} vs {10,11,12} on x, floor-mean update moves the centroids
    to (1,0)/(11,0); final assignment is unchanged."""
    df = _pts(spark, [(1, 0, 0), (2, 10, 0), (3, 1, 0), (4, 11, 0), (5, 2, 0), (6, 12, 0)])
    got = {r["id"]: (r["cid"], r["cx"], r["cy"]) for r in kmeans_int_2d(df, k=2, rounds=1).collect()}
    assert got == {
        1: (0, 1, 0), 3: (0, 1, 0), 5: (0, 1, 0),
        2: (1, 11, 0), 4: (1, 11, 0), 6: (1, 11, 0),
    }


def test_kmeans_equidistant_tie_goes_to_smallest_cid(spark):
    """Point (5,0) is squared-distance 25 from both seeds (0,0) and
    (10,0): the (dist, cid) struct-min breaks the tie to cid 0, so the
    update pulls centroid 0 to ((0+5)//2, 0) = (2,0)."""
    df = _pts(spark, [(1, 0, 0), (2, 10, 0), (3, 5, 0)])
    got = {r["id"]: (r["cid"], r["cx"], r["cy"]) for r in kmeans_int_2d(df, k=2, rounds=1).collect()}
    assert got == {1: (0, 2, 0), 3: (0, 2, 0), 2: (1, 10, 0)}


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """Duplicate-coordinate seeds: ids 1,2 both at (0,0) seed centroids
    0 and 1; every point ties to cid 0, so cluster 1 goes EMPTY and must
    keep its previous centroid (0,0) instead of dividing by zero."""
    df = _pts(spark, [(1, 0, 0), (2, 0, 0), (3, 9, 0), (4, 10, 0)])
    out = kmeans_int_2d(df, k=3, rounds=1)
    got = {r["id"]: (r["cid"], r["cx"], r["cy"]) for r in out.collect()}
    assert got == {1: (0, 0, 0), 2: (0, 0, 0), 3: (2, 9, 0), 4: (2, 9, 0)}


def test_kmeans_fewer_rows_than_k_clamps(spark):
    """2 points, k=4: k clamps to the seed count so the update loop
    never indexes past the collected seeds."""
    df = _pts(spark, [(1, 0, 0), (2, 100, 0)])
    got = {r["id"]: r["cid"] for r in kmeans_int_2d(df, k=4, rounds=2).collect()}
    assert got == {1: 0, 2: 1}


def test_kmeans_empty_input_returns_empty_typed_frame(spark):
    df = _pts(spark, []).filter("id > 0")
    out = kmeans_int_2d(df, k=4, rounds=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "cid", "cx", "cy"]


def test_kmeans_nonpositive_k_raises(spark):
    df = _pts(spark, [(1, 0, 0)])
    with pytest.raises(ValueError, match="k must be positive"):
        kmeans_int_2d(df, k=0)
    with pytest.raises(ValueError, match="k must be positive"):
        kmeans_int_2d(df, k=-3)
