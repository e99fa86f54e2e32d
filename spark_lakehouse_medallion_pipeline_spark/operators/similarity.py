"""Similarity search over embedding columns (SURVEY.md §2b X19, X21).

Two paths:
  - brute-force cosine top-k: exact baseline. Dot products via
    F.zip_with + F.aggregate in double precision — JVM expressions, no
    UDF, so a scan+project; per-query cost is one pass over the corpus.
  - LSH-bucketed ANN: random-hyperplane signatures (deterministic
    hyperplanes derived from xxhash64) bucket the corpus; queries probe
    only their bucket — the 100 TB path, where brute force per query is
    a full scan and the bucket join is a hash join on a short bit-string.

Embeddings: array<float> columns (driver corpus: 64-dim, L2-normalized,
so cosine == dot product; we still normalize defensively).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_brute(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    One scan + TakeOrderedAndProject — no shuffle of the corpus, each
    partition keeps its k best. Tie-broken on id for determinism.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def knn_join_brute(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join (every query row gets its k nearest corpus rows).

    Broadcast the (small) query side against the corpus scan, then a
    row_number window per query. For large query sets, use
    lsh_knn_join instead — this one is O(|Q| x |C|).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(q_id), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        F.col(q_id),
        F.col(c_id),
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine_sim"), F.col(c_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def _hyperplane(dim: int, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane i is
    a hash-derived value in [-1, 1). No stored model, same plane on every
    executor — the property that makes the signature reproducible at scale."""
    return F.array(
        *[
            (
                F.xxhash64(F.lit(f"plane:{plane_idx}:{j}")).cast("double")
                / F.lit(float(2**63))
            )
            for j in range(dim)
        ]
    )


def rhp_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane (SimHash for cosine) signature: bit i = sign of
    <vec, plane_i>, packed into a bigint. P[bits agree] = 1 - theta/pi."""
    bits = [
        F.when(dot(vec, _hyperplane(dim, i)) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        * F.lit(2**i).cast("bigint")
        for i in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN k-NN join: bucket both sides by RHP signature, hash-join on the
    bucket, exact cosine + top-k inside buckets.

    Scale shape: corpus shuffle is by a 2^n_planes-ary key (uniform for
    normalized embeddings); no cross join anywhere. Recall is tunable via
    n_planes (fewer planes -> bigger buckets -> higher recall, more work);
    multi-probe (flipping one bit) can be added by exploding the query
    signature — kept single-probe here for plan clarity.
    """
    from pyspark.sql import Window

    c_sig = corpus.select(
        F.col(c_id), F.col(vec_col).alias("_cvec"), rhp_signature(F.col(vec_col), dim, n_planes).alias("_bucket")
    )
    q_sig = queries.select(
        F.col(q_id), F.col(vec_col).alias("_qvec"), rhp_signature(F.col(vec_col), dim, n_planes).alias("_bucket")
    )
    scored = c_sig.join(q_sig, on="_bucket").select(
        F.col(q_id),
        F.col(c_id),
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine_sim"), F.col(c_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def embedding_stats(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Typed-array column ops (X21): dimension, L2 norm, component slices."""
    v = F.col(vec_col)
    return corpus.select(
        F.col(id_col),
        F.size(v).alias("dim"),
        F.round(l2_norm(v), 6).alias("l2_norm"),
        F.round(F.element_at(v, 1).cast("double"), 6).alias("first_component"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x.cast("double")),
            6,
        ).alias("head8_sum"),
    )
