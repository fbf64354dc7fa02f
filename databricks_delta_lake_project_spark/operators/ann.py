"""Production fast path for embedding similarity: Arrow-batched
pandas-UDF cosine top-k over a broadcast query matrix (the float
counterpart to the exact-decimal oracle formulation in
``queries/similarity.py`` — see `docs/SCALE.md`).

Plan shape: the query matrix (k queries x d dims) is tiny and ships to
every task inside the UDF closure; candidates stream through
``mapInPandas`` in Arrow batches; each batch computes a dense
(batch x queries) GEMM via numpy and emits only per-candidate partial
results. A final per-query top-k window reduces across batches. No
shuffle until the (candidates x queries) scores — and those are k
numbers per candidate, not vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_SCORE_SCHEMA = StructType(
    [
        StructField("neighbor_id", LongType()),
        StructField("query_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def cosine_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Top-k cosine neighbors for each query id, float/numpy path.

    Returns (query_id, neighbor_id, knn_rank, cosine); queries never
    match themselves. Ranking ties break on neighbor_id ascending so
    results are deterministic.
    """
    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    if not q_rows:
        raise ValueError(f"no query vectors found for ids {query_ids}")
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cand = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            c_norm = np.linalg.norm(cand, axis=1)
            c_norm[c_norm == 0] = 1.0
            # (batch x d) @ (d x queries) -> one GEMM per Arrow batch
            sims = (cand @ q_mat.T) / np.outer(c_norm, q_norm)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "neighbor_id": np.repeat(
                        pdf[id_col].to_numpy(np.int64), len(q_ids)
                    ),
                    "query_id": np.tile(q_ids, n),
                    "cosine": sims.ravel(),
                }
            )

    scored = (
        embeddings.select(id_col, vec_col)
        .mapInPandas(score, _SCORE_SCHEMA)
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "knn_rank", "cosine")
    )


def ivf_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-Flat approximate top-k: the inverted-file scale path
    (complement to the sign-LSH variant in ``queries/similarity.py``).

    1. Train a coarse quantizer (seeded distributed KMeans) — at 100 TB
       train on a sample; assignment stays a narrow map either way.
    2. Assign every vector to its nearest centroid (inverted list).
    3. Per query, probe the ``n_probe`` nearest lists only — the scan
       fraction is ~n_probe/n_lists, which is what keeps ANN sub-linear
       when the candidate side can't be broadcast.
    4. Exact float cosine within the probed lists, JVM-side
       (zip_with + aggregate — no Python in the per-candidate path),
       then a per-query top-k window.

    Returns (query_id, neighbor_id, ivf_rank, cosine).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    feat = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("features", array_to_vector(F.col("vec")))
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="features", predictionCol="list_id"
    ).fit(feat)
    assigned = model.transform(feat).select("vid", "vec", "list_id")

    centers = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    if not q_rows:
        raise ValueError(f"no query vectors found for ids {query_ids}")
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        d2 = ((centers - qv) ** 2).sum(axis=1)
        for lid in np.argsort(d2)[:n_probe]:
            probe_rows.append((int(r[id_col]), int(lid)))
    probes = spark.createDataFrame(probe_rows, "query_id long, list_id int")

    qvecs = assigned.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qvec")
    )
    cand = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vid") != F.col("query_id"))
        .join(F.broadcast(qvecs), "query_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            (dot / (norm(F.col("vec")) * norm(F.col("qvec")))).alias("cosine"),
        )
        .withColumn("ivf_rank", F.row_number().over(w))
        .filter(F.col("ivf_rank") <= k)
        .select("query_id", "neighbor_id", "ivf_rank", "cosine")
    )
