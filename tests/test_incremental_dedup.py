"""Incremental MinHash dedup: a new batch probed against a corpus
index must find exactly the near-dup pairs a full-corpus pass would
report for pairs touching the batch — without re-deriving the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.dedup import (
    incremental_near_dup_pairs,
    minhash_index,
    minhash_lsh_pairs,
    ngram_jaccard,
)
from tests.conftest import SF_MED

THRESHOLD = 0.5


def _docs(spark):
    return spark.read.parquet(f"{SF_MED}/documents.parquet").select(
        "doc_id", "text"
    )


def _split(docs):
    cut = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    return docs.filter(F.col("doc_id") <= cut), docs.filter(F.col("doc_id") > cut)


def test_incremental_matches_full_pass(spark):
    docs = _docs(spark)
    corpus, batch = _split(docs)
    index = minhash_index(corpus, "doc_id", "text")

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_near_dup_pairs(
            batch, index, "doc_id", "text", THRESHOLD
        ).collect()
    }

    # ground truth: a full-corpus pass with the SAME LSH
    # parameterization (self-join of the whole-corpus index + exact
    # Jaccard verify), restricted to pairs with a batch-side doc
    full_idx = minhash_index(docs, "doc_id", "text")
    a, b = full_idx.alias("a"), full_idx.alias("b")
    ni = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    nu = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - ni
    full = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (ni.cast("double") / F.greatest(nu, F.lit(1)).cast("double")).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
        .dropDuplicates(["id_a", "id_b"])
    )
    new_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }

    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12
    assert want, "split produced no cross/batch near-dup pairs; test is vacuous"


def test_probe_broadcasts_batch_side(spark):
    docs = _docs(spark)
    corpus, batch = _split(docs)
    index = minhash_index(corpus, "doc_id", "text")
    plan = incremental_near_dup_pairs(
        batch, index, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
