"""Property-based invariants (hypothesis) for the mutation operators —
coverage the reference lacks entirely (SURVEY §5 "Absent: no
property-based or randomized testing").

Strategy sizes are kept small: each example spins real Spark jobs, so
we bound example counts and rely on shrinking for diagnosis.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.dedup import deduplicate
from databricks_delta_lake_project_spark.operators.scd import (
    scd2_apply,
    scd2_prepare_initial,
)
from databricks_delta_lake_project_spark.tables import LakeTable

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.text(alphabet="abc", min_size=0, max_size=3)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


rows_strategy = st.lists(
    st.tuples(KEYS, st.integers(min_value=0, max_value=100), VALS),
    min_size=0,
    max_size=25,
)


@_slow
@given(rows=rows_strategy)
@pytest.mark.slow
def test_merge_upsert_matches_dict_semantics(spark, tmp_path_factory, rows):
    """Folding batches through MERGE == folding through a python dict:
    last write per key wins, every key present exactly once."""
    base = tmp_path_factory.mktemp("merge")
    df = spark.createDataFrame(
        [(k, o, v) for k, o, v in rows] or [(0, 0, "")],
        "k long, ord long, v string",
    )
    # batch 1 = even ord rows, batch 2 = odd — arbitrary split
    b1 = df.filter("ord % 2 = 0")
    b2 = df.filter("ord % 2 = 1")
    # within a batch MERGE requires unique keys: keep max-ord row
    b1 = deduplicate(b1, ["k"], [F.col("ord").desc(), F.col("v").desc()])
    b2 = deduplicate(b2, ["k"], [F.col("ord").desc(), F.col("v").desc()])

    t = LakeTable.create(spark, str(base / "t"), df=b1)
    (
        t.merge(b2, "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = {r["k"]: (r["ord"], r["v"]) for r in t.to_df().collect()}

    expect: dict[int, tuple[int, str]] = {}
    for frame in (b1, b2):
        for r in frame.collect():
            expect[r["k"]] = (r["ord"], r["v"])
    assert got == expect


@_slow
@given(rows=rows_strategy)
@pytest.mark.slow
def test_dedup_idempotent_and_minimal(spark, rows):
    """dedup(dedup(x)) == dedup(x); exactly one row per key; the kept
    row is the max by ordering."""
    df = spark.createDataFrame(
        [(k, o, v) for k, o, v in rows] or [(0, 0, "")],
        "k long, ord long, v string",
    )
    order = [F.col("ord").desc(), F.col("v").desc()]
    once = deduplicate(df, ["k"], order)
    twice = deduplicate(once, ["k"], order)
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice
    per_key = {}
    for k, o, v in sorted(map(tuple, df.collect())):
        cur = per_key.get(k)
        if cur is None or (o, v) > (cur[1], cur[2]):
            per_key[k] = (k, o, v)
    assert got_once == sorted(per_key.values())


@_slow
@given(
    batches=st.lists(
        st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=6, unique_by=lambda t: t[0]),
        min_size=1,
        max_size=3,
    )
)
@pytest.mark.slow
def test_scd2_chain_invariants(spark, tmp_path_factory, batches):
    """After any sequence of SCD2 batches: exactly one current row per
    key; closed versions have end timestamps; the current row equals
    the latest distinct value seen for the key."""
    base = tmp_path_factory.mktemp("scd")
    ts0 = "2024-01-01 00:00:00"

    def frame(rows, ts):
        return spark.createDataFrame(
            [(k, v) for k, v in rows], "k long, v string"
        ).withColumn("updated_at", F.lit(ts).cast("timestamp"))

    t = LakeTable.create(
        spark, str(base / "t"),
        df=scd2_prepare_initial(frame(batches[0], ts0), "updated_at"),
    )
    latest: dict[int, str] = dict(batches[0])
    for i, batch in enumerate(batches[1:], start=1):
        ts = f"2024-01-{i + 1:02d} 00:00:00"
        scd2_apply(t, frame(batch, ts), key="k", tracked=["v"], ts_col="updated_at")
        latest.update(dict(batch))

    df = t.to_df()
    cur = df.filter("is_current").collect()
    assert len(cur) == len({r["k"] for r in cur})  # one current per key
    assert {r["k"]: r["v"] for r in cur} == latest
    closed = df.filter("NOT is_current").collect()
    assert all(r["effective_end_ts"] is not None for r in closed)
    # version chains never lose keys
    assert {r["k"] for r in df.collect()} == set(latest)
