"""Distributed clustering in exact integer arithmetic.

Same discipline as operators.graph: truncating integer-divide means
(trunc-toward-zero, matching Spark ``div`` / DuckDB ``//``) and integer
squared distances make a fixed iteration count BIT-IDENTICAL across
engines, so the classic iterative-ML loop (Lloyd k-means) can be
value-oracled as unrolled SQL CTEs instead of settling for a rows-only
check. The reference analytics surface has no ML ops; this extends the
engine the way a training-data pipeline needs (mixture balancing,
embedding-space bucketing both reduce to k-means-style assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_int_2d(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    k: int = 4,
    rounds: int = 2,
) -> DataFrame:
    """Lloyd k-means on 2-D integer features, ``rounds`` iterations.

    Seeds are the ``k`` rows with the smallest ids (deterministic, no
    RNG). Each round: (1) assign every point to the centroid minimizing
    integer squared distance, ties to the smallest centroid id; (2)
    recompute each centroid as the truncating integer-divide mean of its
    members — Spark ``div`` and DuckDB ``//`` both truncate TOWARD ZERO,
    which differs from floor when a coordinate sum is negative (allowed
    by the contract below); oracles for negative-feature data must be
    written against trunc, not floor
    (empty clusters keep their previous centroid). Returns the final
    assignment (id, cid, cx, cy).

    Scale shape: the k centroids are a bounded driver-side model
    (collected each round, k rows — the IVF-training discipline from
    operators.similarity), so ASSIGNMENT IS SHUFFLE-FREE: distances to
    all k centroids are inlined as literal column expressions and the
    argmin is a fold over a k-long array, all inside whole-stage
    codegen. The only shuffle per round is the map-side-combinable
    centroid-update aggregate. That is the plan you want at 100 TB:
    per-round cost = one scan + one k-row aggregate, never a join or a
    window over the point set.

    Caller contract: features must be pre-scaled so (x - cx)^2 fits
    int64 — |x| < ~3e9 keeps the square under 2^63 (the
    stratified-sample overflow lesson; dollars not cents for money).
    """
    if k <= 0:
        # A non-positive k on a non-empty dataset is a caller bug, not a
        # degenerate input — fail loudly instead of returning all-null
        # assignments (the null early-return below is reserved for a
        # genuinely empty points table).
        raise ValueError(f"k must be positive, got {k}")
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    seed_rows = pts.orderBy("id").limit(k).collect()
    cents = [(int(r["x"]), int(r["y"])) for r in seed_rows]
    # Fewer rows than k: clamp so the update loop never indexes past the
    # collected seeds (cents[i] for i in range(k) below).
    k = len(cents)
    if k == 0:
        return pts.select(
            "id",
            F.lit(None).cast("int").alias("cid"),
            F.lit(None).cast("long").alias("cx"),
            F.lit(None).cast("long").alias("cy"),
        )

    def assign_expr(cents_: list[tuple[int, int]]):
        # array of (dist, cid) structs; array_min is lexicographic, so
        # equal distances break to the smallest cid.
        pairs = [
            F.struct(
                (
                    (F.col("x") - F.lit(cx)) * (F.col("x") - F.lit(cx))
                    + (F.col("y") - F.lit(cy)) * (F.col("y") - F.lit(cy))
                ).alias("d"),
                F.lit(i).cast("int").alias("cid"),
            )
            for i, (cx, cy) in enumerate(cents_)
        ]
        return F.array_min(F.array(*pairs))["cid"]

    for _ in range(rounds):
        assigned = pts.withColumn("cid", assign_expr(cents))
        upd = {
            int(r["cid"]): (int(r["cx"]), int(r["cy"]))
            for r in assigned.groupBy("cid")
            .agg(
                F.expr("SUM(x) div COUNT(*)").alias("cx"),
                F.expr("SUM(y) div COUNT(*)").alias("cy"),
            )
            .collect()
        }
        cents = [upd.get(i, cents[i]) for i in range(k)]

    final = pts.withColumn("cid", assign_expr(cents))
    cent_df = final.sparkSession.createDataFrame(
        [(i, cx, cy) for i, (cx, cy) in enumerate(cents)],
        "cid int, cx long, cy long",
    )
    return final.join(F.broadcast(cent_df), "cid").select(
        "id", "cid", "cx", "cy"
    )
