"""Quantile binning (the scale-safe ntile replacement) and the
pandas-UDF cosine top-k fast path, cross-checked against the
exact-decimal oracle query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.ann import cosine_topk
from databricks_delta_lake_project_spark.operators.binning import (
    bin_expr,
    quantile_bins,
)
from databricks_delta_lake_project_spark.queries.catalog import load
from databricks_delta_lake_project_spark.queries.similarity import (
    q34_knn_bruteforce,
)

from conftest import SF_SMALL


def test_quantile_bins_balanced(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    out = quantile_bins(df, "x", 5, "bucket", relative_error=0.0001)
    counts = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {1, 2, 3, 4, 5}
    # equal-frequency within approximation error
    assert all(150 <= n <= 250 for n in counts.values())
    # binning is monotone in x
    rows = out.orderBy("x").collect()
    buckets = [r["bucket"] for r in rows]
    assert buckets == sorted(buckets)


def test_bin_expr_edges(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,), (99.0,)], "x double")
    out = df.select("x", bin_expr(F.col("x"), [5.0, 10.0]).alias("b")).collect()
    got = {r["x"]: r["b"] for r in out}
    assert got == {0.0: 1, 5.0: 1, 10.0: 2, 99.0: 3}  # <= breakpoint stays low


def test_cosine_topk_matches_exact_oracle_query(spark):
    e = load(spark, SF_SMALL, "embeddings")
    fast = cosine_topk(e, "vec_id", "embedding", query_ids=[0, 1, 2, 3, 4], k=10)
    exact = q34_knn_bruteforce(spark, SF_SMALL)

    f = {(r["query_id"], r["knn_rank"]): (r["neighbor_id"], r["cosine"])
         for r in fast.collect()}
    x = {(r["query_id"], r["knn_rank"]): (r["neighbor_id"], r["cosine"])
         for r in exact.collect()}
    assert set(f) == set(x)
    mismatched_ids = 0
    for key, (fn, fc) in f.items():
        xn, xc = x[key]
        # float path vs 1e-6-quantized exact path: cosines agree to ~1e-5
        assert abs(fc - xc) < 1e-4
        if fn != xn:
            mismatched_ids += 1
    # neighbor ordering may flip only between near-tied cosines
    assert mismatched_ids <= 2


def test_ivf_topk_prunes_and_recalls(spark):
    """IVF-Flat: probes n_probe/n_lists of the data yet keeps useful
    recall vs the exact brute force; ranks are deterministic."""
    from databricks_delta_lake_project_spark.operators.ann import ivf_topk

    e = load(spark, SF_SMALL, "embeddings")
    query_ids = [0, 1, 2]
    exact = cosine_topk(e, "vec_id", "embedding", query_ids, k=10)
    exact_sets = {
        qid: {r["neighbor_id"] for r in rows}
        for qid, rows in _group(exact.collect()).items()
    }
    approx = ivf_topk(
        e, "vec_id", "embedding", query_ids, k=10, n_lists=8, n_probe=4
    )
    rows = approx.collect()
    got = _group(rows)
    assert set(got) == set(query_ids)
    for qid, rws in got.items():
        assert len(rws) == 10
        ranks = [r["ivf_rank"] for r in rws]
        assert sorted(ranks) == list(range(1, 11))
        # probing half the lists of near-random data must still find a
        # fair share of the true neighborhood
        hits = len({r["neighbor_id"] for r in rws} & exact_sets[qid])
        assert hits >= 3, f"recall too low for query {qid}: {hits}/10"


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    return out


def test_topk_per_key_nan_and_null_key_parity(spark):
    """The local pandas prune must rank NaN scores exactly like the
    Spark merge window (NaN greater than every real value: first under
    desc) and must not drop null keys — both previously diverged from
    the single-window formulation."""
    import math

    from pyspark.sql import Window, functions as F

    from databricks_delta_lake_project_spark.operators.topk import (
        topk_per_key,
    )

    rows = []
    for q in [0, 1, None]:
        for i in range(6):
            rows.append((q, i, float(i)))
        rows.append((q, 99, math.nan))  # NaN score per key
    df = spark.createDataFrame(
        rows, "query_id int, cand_id int, score double"
    ).repartition(4)
    got = topk_per_key(
        df, ["query_id"], "score", k=3, tiebreak=["cand_id"]
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    want = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )
    def norm(res):
        return sorted(
            [
                (r["query_id"], r["cand_id"], r["rank"])
                for r in res.collect()
            ],
            key=str,
        )
    assert norm(got) == norm(want)
    # NaN rows rank FIRST under desc (Spark float semantics)
    top1 = {
        (r["query_id"], r["cand_id"])
        for r in got.filter(F.col("rank") == 1).collect()
    }
    assert top1 == {(0, 99), (1, 99), (None, 99)}
