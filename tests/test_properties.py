"""Property-based checks (hypothesis) for the hand-composed operators
whose edge cases live at bucket/time boundaries — each compared against
a naive reference implementation on randomized inputs.

Few examples, no deadline: every example is a Spark job.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)

offsets = st.integers(min_value=0, max_value=72 * 3600)  # seconds in 3 days


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ts=st.lists(offsets, min_size=1, max_size=30),
    ivs=st.lists(st.tuples(offsets, st.integers(1, 8 * 3600)), min_size=1, max_size=6),
)
def test_interval_join_matches_naive(spark, ts, ivs):
    from spark_lakehouse_medallion_pipeline_spark.operators import timeseries

    events = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(ts)],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, BASE + timedelta(seconds=s), BASE + timedelta(seconds=s + d))
            for j, (s, d) in enumerate(ivs)
        ],
        "iv_id long, window_start timestamp, window_end timestamp",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in timeseries.interval_join_bucketed(events, intervals, "ts").collect()
    )
    naive = sorted(
        (r["event_id"], r["iv_id"])
        for r in events.join(
            intervals,
            (F.col("ts") >= F.col("window_start")) & (F.col("ts") < F.col("window_end")),
        ).collect()
    )
    assert got == naive


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), offsets), min_size=1, max_size=25),
    rights=st.lists(
        st.tuples(st.integers(0, 2), offsets, st.integers(0, 999)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_matches_naive(spark, lefts, rights):
    """asof_join_backward == argmax over right rows with right_ts <= ts,
    including equal timestamps and keys with no right rows at all."""
    from spark_lakehouse_medallion_pipeline_spark.operators import timeseries

    left = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(lefts)],
        "lid long, key int, ts timestamp",
    )
    # Dedup right on (key, ts): at equal times the carried value is
    # whichever sorts last — make it unique so the naive argmax is
    # well-defined.
    seen = {}
    for k, s, v in rights:
        seen[(k, s)] = v
    right = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), v) for (k, s), v in seen.items()],
        "key int, rts timestamp, val int",
    )
    got = {
        r["lid"]: r["asof_val"]
        for r in timeseries.asof_join_backward(
            left, right, "key", "ts", "rts", ["val"]
        ).collect()
    }
    naive = {}
    rrows = right.collect()
    for lrow in left.collect():
        cands = [r for r in rrows if r["key"] == lrow["key"] and r["rts"] <= lrow["ts"]]
        naive[lrow["lid"]] = (
            max(cands, key=lambda r: r["rts"])["val"] if cands else None
        )
    assert got == naive
