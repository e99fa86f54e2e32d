"""Relational operator layer (SURVEY.md §2b X1-X13).

The reference's interactive surface is Trino SQL over the medallion tables
(scripts/run_pipeline.py:240-277); our equivalent is Spark SQL / DataFrame.
These helpers exist to pin down the *scale-aware* form of each operator —
broadcast hints for dimension joins, partial-aggregable conditional counts,
tie-broken top-k — so every query built on them would survive a 100× scale-up.

Scale notes per operator family:
  - equi-joins: AQE picks broadcast vs sort-merge at runtime; we add an
    explicit broadcast() hint for bounded dimension tables (region, nation,
    part, supplier — the classic star-schema small sides).
  - top-k: orderBy(...).limit(k) compiles to TakeOrderedAndProject — no
    global sort materialization, each partition keeps k rows.
  - windows: partitionBy keys chosen to match the natural key distribution;
    running aggregates use explicit ROWS frames (RANGE frames degrade on
    ties and buy nothing here).
  - approx aggregates: HLL / quantile-sketch variants for the 100 TB path
    where exact distinct would shuffle the full key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_lakehouse_medallion_pipeline_spark.functions.scalars import count_if  # noqa: F401  (re-export)


def broadcast_dim(dim: DataFrame) -> DataFrame:
    """Mark a bounded dimension table for broadcast join (X2)."""
    return F.broadcast(dim)


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Deterministic top-k (X11): caller must include a unique tie-breaker
    in order_cols. Compiles to TakeOrderedAndProject (per-partition heap,
    no full sort)."""
    return df.orderBy(*order_cols).limit(k)


def running_agg(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    agg_col: str,
    out_name: str,
) -> DataFrame:
    """Running sum with an explicit ROWS frame (X10)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_name, F.sum(agg_col).over(w))


def ranked_in_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    rank_name: str = "rn",
) -> DataFrame:
    """row_number per group (X8); order_by must be deterministic."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_name, F.row_number().over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization via lag + cumulative sum (X15 batch form).

    Two window passes over the same (user, ts) partitioning — one shuffle,
    both windows reuse it. The same logic is ANSI-SQL expressible, so the
    DuckDB oracle can verify it (unlike F.session_window, which is offered
    separately in operators.timeseries for the streaming path).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # cast("timestamp") first: tolerates TIMESTAMP_NTZ inputs (NTZ cannot
    # cast directly to double); a no-op for already-LTZ columns.
    ts_sec = F.col(ts_col).cast("timestamp").cast("double")
    gap = ts_sec - F.lag(ts_sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new_sess", is_new).withColumn(
        session_col,
        F.sum("_new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_sess")


def approx_distinct(df: DataFrame, group_cols: list[str], target: str, rsd: float = 0.05) -> DataFrame:
    """HLL++ distinct count (X13) — the 100 TB substitute for countDistinct:
    fixed-size sketch per group instead of shuffling every distinct key."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(target, rsd).alias(f"approx_distinct_{target}")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for extreme skew.

    AQE's skew-join split (enabled in session.py) handles most skew by
    splitting oversized partitions, but it cannot split a SINGLE
    pathological key. Salting can: the (big, skewed) left side gets a
    random salt in [0, n_salts), the (smaller) right side is replicated
    n_salts times, and the join key becomes (key, salt) — one hot key's
    rows spread over n_salts tasks at the cost of replicating the right
    side n_salts x (so keep the smaller input on the right).

    Only inner and left-preserving modes are supported: a right- or
    full-outer join would emit every unmatched right row once per salt
    replica (n_salts duplicates).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.replace("_", "").lower() not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join does not support how={how!r}: right-preserving joins "
            "would duplicate unmatched right rows once per salt replica"
        )
    salted_l = left.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return salted_l.join(salted_r, on=[key, "_salt"], how=how).drop("_salt")


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed (and optionally sorted) managed table — the pre-shuffled
    layout: two tables bucketed by the same key into the same bucket
    count join with NO exchange on either side (SortMergeJoin reads
    co-located buckets directly). The write pays the shuffle once;
    every subsequent join of the pair rides for free — the 100 TB
    pattern for fact-to-fact joins repeated across a pipeline."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture batch onto a snapshot: ``changes``
    carries (key, seq, op in {I,U,D}, payload columns matching base's
    schema minus the op/seq columns). Per key, the HIGHEST-seq change
    wins (late-arriving lower-seq ops are ignored — standard CDC
    compaction); a winning D removes the key, a winning I/U replaces the
    row, untouched base rows survive.

    Scale shape: one window shuffle to compact the change batch to its
    winners (change batches are deltas — small next to the snapshot),
    then one left-anti join keyed on the snapshot (AQE broadcasts the
    compacted winners when they fit) + a union. This is the dataflow a
    Delta MERGE compiles to; here it is explicit and format-agnostic —
    pair with sources.io.write_snapshot for a reader-safe commit."""
    from pyspark.sql import Window

    payload = [c for c in base.columns]
    w = Window.partitionBy(key).orderBy(F.desc(seq_col))
    winners = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = base.join(winners.select(key), key, "left_anti")
    upserts = winners.filter(F.col(op_col) != "D").select(*payload)
    return survivors.unionByName(upserts)


def stratified_exact_sample(
    df: DataFrame,
    strata_cols: list[str],
    frac_num: int,
    frac_den: int,
    order_col: str,
) -> DataFrame:
    """Exact stratified sampling: keep floor(n_s * frac_num / frac_den)
    rows of EVERY stratum, chosen by a deterministic portable-md5-hash
    rank over ``order_col`` — the corpus-curation step where each
    domain/language must contribute an exact proportion (a probabilistic
    filter like text.mixture_sample drifts per stratum; training-mixture
    specs are usually contractual).

    The fraction is a rational (frac_num/frac_den) and the quota test is
    pure integer arithmetic (rank*den <= n*num), so results are
    bit-identical across engines — float fractions like 0.2 round-trip
    to 0.2000...011 and flip ceil/floor at exact multiples. The hash
    rank is the portable 60-bit md5 family (``conv(substr(md5(x),18,15),
    16,10)`` here, ``('0x'||substr(md5(x),18,15))::BIGINT`` in
    DuckDB/Trino): int64-safe for ANY order_col value, unlike a raw
    Knuth multiply which silently wraps (ANSI off) or errors (ANSI on)
    above ~2^31 — exactly the range hash-derived 63-bit ids live in.
    Determinism requires ``order_col`` to be unique (it is both the
    hash input and the final tiebreaker); with duplicate values the
    choice among exact ties is partitioning-dependent.

    Scale shape: ONE shuffle on the strata columns serving both the
    per-stratum count (window aggregate) and the rank ordering; no
    global sort, no collect. Skew note: a stratum is ranked by one
    task — for web-scale single-domain strata prefer the shuffle-free
    approximate text.mixture_sample and reserve this for the final
    exact quota pass on the (much smaller) curated output.
    """
    rank = F.conv(
        F.substring(F.md5(F.col(order_col).cast("string")), 18, 15), 16, 10
    ).cast("bigint")
    w = Window.partitionBy(*strata_cols).orderBy(rank.asc(), F.col(order_col).asc())
    w_n = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w_n))
        .filter(F.col("_rn") * F.lit(frac_den) <= F.col("_n") * F.lit(frac_num))
        .drop("_rn", "_n")
    )


# The range-pinned intermediate a distributed_rank call persists (see
# the function's pinning comment) must stay cached until the CALLER's
# terminal action — unpersisting earlier would let the final job re-draw
# the sampled range boundaries and shift partition ids out from under
# the collected offsets. The function therefore cannot release its own
# cache; instead the registry holds the newest _RANK_CACHE_CAP pins and
# evicts beyond that FIFO (queries run serially in the driver / bench /
# oracle gate, so by the time a pin ages out of the window its query's
# action has long completed), and release_rank_caches() drops the rest.
# The cap, not 1, because one query plan may COMPOSE several rank calls
# (e.g. RFM scores ntile three dimensions) and every pin in the plan
# must survive until that plan's single terminal action. Contract: no
# single query composes more than _RANK_CACHE_CAP distributed_rank
# calls. Net cached footprint: at most 8 ranked intermediates at any
# time, not one per call site per session.
_RANK_CACHE_CAP = 8
_LIVE_RANK_CACHE: list[DataFrame] = []


def release_rank_caches() -> None:
    """Unpersist any range-pinned intermediate still cached by a prior
    :func:`distributed_rank` call. Safe to call any time no rank query
    is mid-action; idempotent. Bench/oracle harnesses call this between
    entries so executor storage returns to baseline."""
    while _LIVE_RANK_CACHE:
        _LIVE_RANK_CACHE.pop().unpersist(blocking=False)


def distributed_rank(
    df: DataFrame,
    order_cols: list[Column],
    *,
    rank_col: str = "rank",
    value_col: str | None = None,
    cumsum_col: str | None = None,
    cumsum_cols: dict[str, str] | None = None,
    cummax_cols: dict[str, str] | None = None,
    ntile_col: str | None = None,
    n_tiles: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global row_number (+ optional inclusive prefix sum and NTILE)
    WITHOUT a single-partition window — the classic two-pass
    range-partitioned rank every distributed engine uses where ANSI
    `row_number() OVER (ORDER BY ...)` would funnel all rows through
    one task (Spark logs `WindowExec: No Partition Defined` and moves
    the whole input to ONE partition — the wall this operator removes
    at 100 TB).

    Pass 1: `repartitionByRange` on the ordering (sampled balanced
    boundaries, equal keys co-located), pin the partition assignment
    with an eager localCheckpoint, then ONE tiny per-partition
    count/sum aggregate — collected to the driver, BOUNDED at one row
    per shuffle partition (32 locally, a few thousand on a cluster:
    the same driver-side footprint TakeOrderedAndProject already
    accepts). Pass 2: exclusive prefix offsets (plain Python over the
    partition stats) broadcast-joined back on partition id, plus a
    PARTITIONED window (partitionBy the range-bucket id) for the local
    rank/running sum: every task ranks only its own range slice.

    Semantics contract: `order_cols` must define a TOTAL order (caller
    includes a unique tie-breaker, the repo-wide rule) with no NULL
    keys; then rank == ANSI row_number, cumsum == ROWS UNBOUNDED
    PRECEDING running sum, and ntile == ANSI NTILE(n) (remainder rows
    to the leading tiles), so oracle SQL is unchanged.

    Scale shape: two data passes (one range exchange + one hash
    exchange on the bucket id for the window — each balanced by the
    range sampler), zero single-partition stages. value_col, when
    given, must be int64-safe under global summation (cents
    convention).

    cumsum_cols maps ADDITIONAL value columns to their output prefix-sum
    names ({value col -> cumsum col}); all of them share the same two
    passes and the same one-row-per-partition stats collect, so a
    multi-ECDF statistic (Kolmogorov-Smirnov needs both samples'
    cumulative counts at every value) costs no more than a single
    prefix sum. Same int64-safety contract per column.

    cummax_cols maps value columns to EXCLUSIVE prefix-max outputs —
    ANSI `MAX(x) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)` (NULL on the globally first row). Exclusive, not
    inclusive, because that is the dominance test a 2-D Pareto skyline
    needs (is anything strictly earlier in the order already at least
    this good?) and the inclusive form is recoverable by the caller
    (greatest(premax, x)) while the reverse is not. Same two passes:
    the per-partition stats row carries each column's partition max,
    prior-partition maxima fold in via null-skipping greatest()."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    pid = "_dr_pid"
    # Pin the partition assignment by PERSISTING (range boundaries come
    # from sampling, so an unpinned plan could re-draw them between the
    # stats job and the final job and shift pids). Lazy persist + the
    # stats collect as the materializing action = ONE pass over the
    # data for pin+stats combined (an eager localCheckpoint here would
    # pay an extra full pass just to pin).
    while len(_LIVE_RANK_CACHE) >= _RANK_CACHE_CAP:  # FIFO eviction
        _LIVE_RANK_CACHE.pop(0).unpersist(blocking=False)
    ranged = df.repartitionByRange(n_part, *order_cols).withColumn(
        pid, F.spark_partition_id()
    ).persist()
    _LIVE_RANK_CACHE.append(ranged)
    # Normalize the one-pair sugar (value_col/cumsum_col) and the
    # multi-pair form (cumsum_cols: {value col -> output col}) into one
    # list of (value col, output col); every pair rides the SAME two
    # passes — a k-statistic rank (e.g. the KS test's two ECDFs) costs
    # exactly what a 1-statistic rank costs.
    if cumsum_col is not None and value_col is None:
        raise ValueError("cumsum_col requires value_col")
    pairs: list[tuple[str, str]] = []
    if cumsum_col is not None:
        pairs.append((value_col, cumsum_col))
    if cumsum_cols:
        pairs.extend(cumsum_cols.items())
    mpairs: list[tuple[str, str]] = list(cummax_cols.items()) if cummax_cols else []
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for i, (vc, _) in enumerate(pairs):
        aggs.append(F.sum(vc).cast("bigint").alias(f"_vsum{i}"))
    for i, (vc, _) in enumerate(mpairs):
        aggs.append(F.max(vc).cast("bigint").alias(f"_vmax{i}"))
    # Bounded collect: one row per range bucket (a model, not data).
    stats = sorted(ranged.groupBy(pid).agg(*aggs).collect(), key=lambda r: r[pid])
    offsets, r_off, n_total = [], 0, 0
    v_off = [0] * len(pairs)
    m_off: list[int | None] = [None] * len(mpairs)
    for row in stats:
        offsets.append((row[pid], r_off, *v_off, *m_off))
        r_off += row["_cnt"]
        n_total = r_off
        for i in range(len(pairs)):
            v_off[i] += int(row[f"_vsum{i}"] or 0)
        for i in range(len(mpairs)):
            pmax = row[f"_vmax{i}"]
            if pmax is not None:
                pmax = int(pmax)
                m_off[i] = pmax if m_off[i] is None else max(m_off[i], pmax)
    v_schema = "".join(f", _voff{i} long" for i in range(len(pairs)))
    m_schema = "".join(f", _moff{i} long" for i in range(len(mpairs)))
    off_df = spark.createDataFrame(
        offsets or [(0, 0, *([0] * len(pairs)), *([None] * len(mpairs)))],
        schema=f"{pid} int, _roff long{v_schema}{m_schema}",
    )
    if not offsets:
        off_df = off_df.limit(0)
    w = Window.partitionBy(pid).orderBy(*order_cols)
    out = ranged.withColumn("_lrank", F.row_number().over(w).cast("long"))
    for i, (vc, _) in enumerate(pairs):
        out = out.withColumn(
            f"_lsum{i}",
            F.sum(vc)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
    for i, (vc, _) in enumerate(mpairs):
        # EXCLUSIVE local running max (empty frame on each partition's
        # first row -> NULL, exactly the ANSI 1-PRECEDING frame)
        out = out.withColumn(
            f"_lmax{i}",
            F.max(vc)
            .over(w.rowsBetween(Window.unboundedPreceding, -1))
            .cast("long"),
        )
    out = out.join(F.broadcast(off_df), pid).withColumn(
        rank_col, (F.col("_lrank") + F.col("_roff")).cast("long")
    )
    for i, (_, oc) in enumerate(pairs):
        out = out.withColumn(
            oc, (F.col(f"_lsum{i}") + F.col(f"_voff{i}")).cast("long")
        )
    for i, (_, oc) in enumerate(mpairs):
        # greatest() skips NULLs (NULL only when both sides are NULL =
        # the globally first row), folding prior partitions' maxima in
        out = out.withColumn(
            oc,
            F.greatest(F.col(f"_lmax{i}"), F.col(f"_moff{i}")).cast("long"),
        )
    if ntile_col is not None:
        # ANSI NTILE(n) from the global rank and the (already known)
        # total count: base rows per tile with the remainder spread
        # over the leading tiles — pure integer Column arithmetic.
        base, rem = divmod(n_total, n_tiles)
        cut = rem * (base + 1)
        i = F.col(rank_col)
        if base == 0:
            tile = i  # fewer rows than tiles: row i -> tile i
        else:
            # Exact int64 `div` (never float division: a 100 TB rank
            # exceeds double's 2^53 exact-integer range).
            tile = F.when(
                F.lit(rem > 0) & (i <= F.lit(cut)),
                F.expr(f"({rank_col} - 1) div {base + 1}") + 1,
            ).otherwise(
                F.lit(rem) + F.expr(f"({rank_col} - {cut} - 1) div {base}") + 1
            )
        out = out.withColumn(ntile_col, tile.cast("int"))
    scratch = [
        c for i in range(len(pairs)) for c in (f"_lsum{i}", f"_voff{i}")
    ] + [c for i in range(len(mpairs)) for c in (f"_lmax{i}", f"_moff{i}")]
    return out.drop(pid, "_lrank", "_roff", *scratch)


def top_k_ranked(
    df: DataFrame,
    order_spec: list[tuple[str, bool]],
    k: int,
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k with exact 1-based ranks and ZERO window operators: the
    100 TB form of `row_number() OVER (ORDER BY ...) <= k`. The
    selection compiles to TakeOrderedAndProject (per-partition heap of
    k, driver-side merge — no global sort, no single-partition
    exchange); ranks are then assigned to the <= k survivors by a
    broadcast lexicographic self-join count (rank(a) = |{b : b <= a}|,
    k^2 <= 100 comparisons for the k <= 10 call sites), which equals
    ANSI row_number because the caller's order_spec is a total order
    over non-NULL keys.

    order_spec: [(column_name, descending?), ...] — names, not Column
    exprs, because the self-join must re-derive the comparison on both
    sides."""
    order_cols = [
        F.col(name).desc() if desc else F.col(name).asc() for name, desc in order_spec
    ]
    # Eagerly pin the <=k survivors: the self-join references `top`
    # TWICE, and without the checkpoint each alias would recompute the
    # full upstream lineage (measured: q212's BM25 ran 4x per call).
    # Checkpointing k<=10 rows costs one TakeOrderedAndProject job.
    top = df.orderBy(*order_cols).limit(k).localCheckpoint(eager=True)
    a = top.alias("_tka")
    b = top.alias("_tkb")
    # Lexicographic b <= a over the mixed asc/desc spec.
    before = F.lit(False)
    eq = F.lit(True)
    for name, desc in order_spec:
        ca, cb = F.col(f"_tka.{name}"), F.col(f"_tkb.{name}")
        lt = (cb > ca) if desc else (cb < ca)
        before = before | (eq & lt)
        eq = eq & (cb == ca)
    cond = before | eq
    return (
        a.join(F.broadcast(b), cond, "inner")
        .groupBy(*[F.col(f"_tka.{c}").alias(c) for c in top.columns])
        .agg(F.count(F.lit(1)).cast("long").alias(rank_col))
    )
