"""Embedding similarity search over ``array<float>`` columns
(beyond-reference training-data surface, SURVEY §7 phase 7):
brute-force cosine top-k as the correctness baseline and a
sign-LSH-bucketed approximate variant as the scale path.

Parity design: float components are quantized to integers with
``floor(x * 1e6)`` — float->double is exact, the double multiply and
floor are IEEE-deterministic, so both engines produce identical
BIGINTs (a float->decimal cast is NOT portable: Spark rounds the
shortest-string repr, DuckDB the binary value, and they disagree in
the 9th decimal). Dot products and norms are then exact integer sums
(order-independent); the only IEEE steps (sqrt + one division) are a
single deterministic expression in both engines.

Scale notes: the exploded-decimal formulation is the parity oracle
path. At 100 TB the same plan shape holds (explode shuffles on the
pair key), but the pragmatic fast path is a float dot product via
``F.zip_with``/``F.aggregate`` or an Arrow-batched pandas UDF over a
broadcast query matrix — same top-k semantics, ~10x fewer bytes
shuffled. The sign-LSH variant prunes candidates by bucket before any
dot product is computed, which is what makes top-k tractable when the
candidate side no longer fits a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topk import topk_per_key
from .catalog import load, widen

N_QUERIES = 5  # vec_id < 5 act as the query set
TOP_K = 10
LSH_BITS = 4
LSH_TOP_K = 5


QUANT = 1_000_000.0  # 1e-6 component quantization


def _quantized(e: DataFrame) -> DataFrame:
    """(vec_id, qv: array<long>, norm2) — one map-side pass quantizes
    the vector and its exact squared norm (integer units: 64 dims *
    (1e6)^2 ~ 6e13 << 2^63). Array-native: no per-dimension explode,
    so deriving it is shuffle-free and the arrays ride later joins as
    ~0.5 KB payloads."""
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )
    return e.select("vec_id", qv.alias("qv")).withColumn(
        "norm2",
        F.aggregate(
            F.transform("qv", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def _dot(a, b) -> Column:
    """Exact integer dot product of two quantized arrays (order-
    independent sum -> bit-identical to the oracle's exploded SUM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def q33_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality — the embedding-column
    sanity profile (exact decimal sum of squares, IEEE sqrt at the
    end)."""
    e = widen(load(spark, sf_dir, "embeddings"))
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )
    # fully map-side: quantize + exact integer sum of squares + sqrt in
    # one projection — zero shuffles at any scale
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        (
            F.sqrt(
                F.aggregate(
                    F.transform(qv, lambda x: x * x),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).cast("double")
            )
            / QUANT
        ).alias("l2_norm"),
    )


Q33_SQL = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xd
  FROM embeddings
), norms AS (
  SELECT vec_id, SQRT(CAST(SUM(xd * xd) AS DOUBLE)) / 1000000.0 AS l2_norm,
         COUNT(*) AS n_dims
  FROM ex GROUP BY 1
)
SELECT e.vec_id, e.label, n.n_dims, n.l2_norm
FROM embeddings e JOIN norms n ON e.vec_id = n.vec_id
"""


def q34_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact ANN baseline. Query vectors
    (vec_id < N_QUERIES) against all other vectors; dot product via
    dimension-aligned equijoin + exact decimal sum; per-query top-k by
    (cosine desc, neighbor asc) row_number.
    """
    e = widen(load(spark, sf_dir, "embeddings"))
    vecs = _quantized(e)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("qn2"),
    )
    # broadcast the tiny query side; each candidate row computes all
    # query dot products map-side (zip_with over the quantized arrays).
    # Top-k runs as LOCAL prune + tiny merge (operators/topk.py): a
    # Window.partitionBy(query_id) would serialize every candidate row
    # through N_QUERIES partitions — the local top-k ships only
    # partitions x k rows per query into the merge window instead.
    cand = vecs.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cosine = _dot(F.col("qv"), F.col("q_qv")).cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine.alias("cosine"),
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        score="cosine",
        k=TOP_K,
        tiebreak=["neighbor_id"],
        rank_col="knn_rank",
    ).select("query_id", "neighbor_id", "knn_rank", "cosine")


Q34_SQL = f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xd
  FROM embeddings
), norms AS (
  SELECT vec_id, SUM(xd * xd) AS norm2 FROM ex GROUP BY 1
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.xd * c.xd) AS dot
  FROM ex q JOIN ex c ON q.pos = c.pos AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2
), scored AS (
  SELECT d.query_id, d.neighbor_id,
    CAST(d.dot AS DOUBLE)
      / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(cn.norm2 AS DOUBLE))) AS cosine
  FROM dots d
  JOIN norms qn ON qn.vec_id = d.query_id
  JOIN norms cn ON cn.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, knn_rank, cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS knn_rank
  FROM scored
) WHERE knn_rank <= {TOP_K}
"""


def q35_ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors with sign-LSH bucketing: bucket =
    sign bits of the first LSH_BITS dimensions (coordinate-hyperplane
    LSH); candidates are restricted to the query's bucket BEFORE any
    dot product — the pruning that keeps ANN tractable at scale.
    Exact-decimal cosine within the bucket, top-k per query.
    """
    e = widen(load(spark, sf_dir, "embeddings"))
    bucket = sum(
        (
            F.when(F.element_at(F.col("embedding"), i + 1) >= 0, F.lit(1 << i)).otherwise(
                0
            )
            for i in range(LSH_BITS)
        ),
        F.lit(0),
    )
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )
    vecs = e.select(
        "vec_id", bucket.alias("bucket"), qv.alias("qv")
    ).withColumn(
        "norm2",
        F.aggregate(
            F.transform("qv", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("qn2"),
    )
    # bucket equijoin prunes candidates BEFORE any dot product; the
    # broadcast query side keeps it shuffle-free, and zip_with computes
    # the exact dot map-side (no per-dimension explode)
    cand = vecs.join(F.broadcast(queries), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cosine = _dot(F.col("qv"), F.col("q_qv")).cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("norm2").cast("double"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "bucket",
        cosine.alias("cosine"),
    )
    # local prune + merge instead of a query_id-partitioned global
    # window (see q34 / operators/topk.py)
    return topk_per_key(
        scored,
        keys=["query_id"],
        score="cosine",
        k=LSH_TOP_K,
        tiebreak=["neighbor_id"],
        rank_col="ann_rank",
    ).select("query_id", "neighbor_id", "bucket", "ann_rank", "cosine")


_D_BUCKET = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(LSH_BITS)
)

Q35_SQL = f"""
WITH buckets AS (
  SELECT vec_id, {_D_BUCKET} AS bucket FROM embeddings
), ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xd
  FROM embeddings
), norms AS (
  SELECT vec_id, SUM(xd * xd) AS norm2 FROM ex GROUP BY 1
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket
  FROM buckets q JOIN buckets c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), dots AS (
  SELECT cd.query_id, cd.neighbor_id, cd.bucket, SUM(qx.xd * cx.xd) AS dot
  FROM cand cd
  JOIN ex qx ON qx.vec_id = cd.query_id
  JOIN ex cx ON cx.vec_id = cd.neighbor_id AND cx.pos = qx.pos
  GROUP BY 1, 2, 3
), scored AS (
  SELECT d.query_id, d.neighbor_id, d.bucket,
    CAST(d.dot AS DOUBLE)
      / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(cn.norm2 AS DOUBLE))) AS cosine
  FROM dots d
  JOIN norms qn ON qn.vec_id = d.query_id
  JOIN norms cn ON cn.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, bucket, ann_rank, cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS ann_rank
  FROM scored
) WHERE ann_rank <= {LSH_TOP_K}
"""


NEAR_DUP_COSINE = 0.35


def q41_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the dedup flavor of
    similarity (vs q34/q35's search flavor): all within-bucket pairs
    whose exact cosine clears a threshold. Blocking = sign-LSH bucket
    (high-cosine vectors agree on sign bits with high probability), so
    the candidate set is |bucket|^2/2 per bucket, not n^2/2 global —
    the property that keeps the pair join tractable at 100 TB. Same
    integer-quantized exact math as q34, so DuckDB matches bit-for-bit.
    """
    e = widen(load(spark, sf_dir, "embeddings"))
    bucket = sum(
        (
            F.when(
                F.element_at(F.col("embedding"), i + 1) >= 0, F.lit(1 << i)
            ).otherwise(0)
            for i in range(LSH_BITS)
        ),
        F.lit(0),
    )
    # array-native formulation: ONE pass quantizes the vector and its
    # squared norm; the pair join carries the ~0.5 KB long arrays and
    # the dot product runs map-side as zip_with+aggregate — one shuffle
    # (the bucket join) total, vs three for the exploded-row plan.
    # Integer sums are order-independent, so this matches the exploded
    # DuckDB oracle bit-for-bit.
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )
    vecs = e.select(
        "vec_id", bucket.alias("bucket"), qv.alias("qv")
    ).withColumn(
        "norm2",
        F.aggregate(
            F.transform("qv", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    a, c = vecs.alias("a"), vecs.alias("c")
    dot = F.aggregate(
        F.zip_with(F.col("a.qv"), F.col("c.qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cosine = dot.cast("double") / (
        F.sqrt(F.col("a.norm2").cast("double"))
        * F.sqrt(F.col("c.norm2").cast("double"))
    )
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") < F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("c.vec_id").alias("id_b"),
        F.col("a.bucket").alias("bucket"),
        cosine.alias("cosine"),
    )
    # The win of filtering on the aliased projection is removing the
    # old pair-scale Window.partitionBy(id_a,id_b) SHUFFLE, not single
    # evaluation: Catalyst's PushDownPredicates re-inlines the aliased
    # expression into the pushed filter (zip_with appears twice in the
    # optimized plan), so the cosine runs once per candidate pair in
    # the filter and again for survivors in the projection. Survivors
    # are a tiny fraction of candidates, so the re-evaluation is noise
    # next to the shuffle it replaced; if it ever mattered, the fix is
    # an exchange-free barrier (localCheckpoint) below the filter.
    return pairs.filter(F.col("cosine") >= NEAR_DUP_COSINE)


Q41_SQL = f"""
WITH buckets AS (
  SELECT vec_id, {_D_BUCKET} AS bucket FROM embeddings
), ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xd
  FROM embeddings
), norms AS (
  SELECT vec_id, SUM(xd * xd) AS norm2 FROM ex GROUP BY 1
), cand AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket
  FROM buckets a JOIN buckets c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
), dots AS (
  SELECT cd.id_a, cd.id_b, cd.bucket, SUM(qx.xd * cx.xd) AS dot
  FROM cand cd
  JOIN ex qx ON qx.vec_id = cd.id_a
  JOIN ex cx ON cx.vec_id = cd.id_b AND cx.pos = qx.pos
  GROUP BY 1, 2, 3
)
SELECT d.id_a, d.id_b, d.bucket,
  CAST(d.dot AS DOUBLE)
    / (SQRT(CAST(an.norm2 AS DOUBLE)) * SQRT(CAST(bn.norm2 AS DOUBLE))) AS cosine
FROM dots d
JOIN norms an ON an.vec_id = d.id_a
JOIN norms bn ON bn.vec_id = d.id_b
WHERE CAST(d.dot AS DOUBLE)
    / (SQRT(CAST(an.norm2 AS DOUBLE)) * SQRT(CAST(bn.norm2 AS DOUBLE)))
    >= {NEAR_DUP_COSINE}
"""


SIMILARITY_QUERIES = {
    "q34_knn_bruteforce": (q34_knn_bruteforce, Q34_SQL),
    "q35_ann_sign_lsh": (q35_ann_sign_lsh, Q35_SQL),
    "q41_embedding_near_dup": (q41_embedding_near_dup, Q41_SQL),
}
