"""Text-analysis and document-dedup operators for training-data
curation (SURVEY §7 phase 7; beyond-reference LLM-pipeline surface):
language-ID heuristic, BPE-ish token stats, content fingerprints,
exact n-gram Jaccard, SimHash, MinHash-LSH.

Everything except the LSH entry is expressed with JVM-side built-ins
(regexp, higher-order array functions, md5/conv bit math) so the hot
path stays in whole-stage codegen AND has an exact DuckDB oracle.
Hash choices are engine-portable on purpose: md5 (identical hex in
Spark/DuckDB) rather than xxhash64 (Spark-only) wherever an oracle
exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load, widen

TOKEN_RE = r"[a-z0-9]+|[^a-z0-9\s]+"
SHINGLE_N = 3

LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "en", "y"),
    "fr": ("le", "la", "et", "un", "dans"),
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def _shingles(tokens: Column, n: int = SHINGLE_N) -> Column:
    """Word n-grams; when the doc has < n tokens the whole doc is one
    shingle. Mirrored exactly in the DuckDB oracle strings below."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))


# DuckDB fragments mirroring _tokens/_shingles
_D_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_D_SHINGLES = (
    f"list_transform(range(0, greatest(len({_D_TOKS}) - {SHINGLE_N}, 0) + 1), "
    f"i -> array_to_string(({_D_TOKS})[i+1:i+{SHINGLE_N}], ' '))"
)


def q27_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language identification: score the token set
    against per-language stopword lists, argmax with a fixed priority
    tiebreak (beyond-reference text analysis; the n-gram-heuristic
    shape the training-data brief asks for).

    Pure map-side projection — at 100 TB this pipelines into the scan
    with zero shuffle.
    """
    d = widen(load(spark, sf_dir, "documents"))
    toks = _tokens(F.col("text"))

    def hits(words: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    h = {lang: hits(words) for lang, words in LANG_PROFILES.items()}
    predicted = (
        F.when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]), "en")
        .when(h["es"] >= h["fr"], "es")
        .otherwise("fr")
    )
    best = F.greatest(*h.values())
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        h["en"].alias("hits_en"),
        h["es"].alias("hits_es"),
        h["fr"].alias("hits_fr"),
        predicted.alias("predicted_lang"),
        (
            best.cast("double")
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ).alias("confidence"),
    )


def _d_hits(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_D_TOKS}, t -> t IN ({inlist})))"


Q27_SQL = f"""
SELECT doc_id, lang AS labeled_lang,
  {_d_hits(LANG_PROFILES['en'])} AS hits_en,
  {_d_hits(LANG_PROFILES['es'])} AS hits_es,
  {_d_hits(LANG_PROFILES['fr'])} AS hits_fr,
  CASE WHEN {_d_hits(LANG_PROFILES['en'])} >= {_d_hits(LANG_PROFILES['es'])}
        AND {_d_hits(LANG_PROFILES['en'])} >= {_d_hits(LANG_PROFILES['fr'])} THEN 'en'
       WHEN {_d_hits(LANG_PROFILES['es'])} >= {_d_hits(LANG_PROFILES['fr'])} THEN 'es'
       ELSE 'fr' END AS predicted_lang,
  CAST(GREATEST({_d_hits(LANG_PROFILES['en'])}, {_d_hits(LANG_PROFILES['es'])},
                {_d_hits(LANG_PROFILES['fr'])}) AS DOUBLE)
    / CAST(GREATEST(len({_D_TOKS}), 1) AS DOUBLE) AS confidence
FROM documents
"""


def q28_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: regex lexer splitting words vs
    punctuation runs, with unique-token and char-length stats
    (beyond-reference token-counting operator).

    regexp_extract_all + integer higher-order aggregate — exact math,
    no floats until the final ratio.
    """
    d = widen(load(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        total_chars.alias("total_token_chars"),
        (
            total_chars.cast("double")
            / F.greatest(n_tokens, F.lit(1)).cast("double")
        ).alias("avg_token_len"),
        (
            n_unique.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
        ).alias("unique_ratio"),
    )


_D_BPE = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"

Q28_SQL = f"""
SELECT doc_id, n_chars,
  len({_D_BPE}) AS n_tokens,
  len(list_distinct({_D_BPE})) AS n_unique_tokens,
  CAST(list_sum(list_transform({_D_BPE}, t -> len(t))) AS BIGINT) AS total_token_chars,
  CAST(list_sum(list_transform({_D_BPE}, t -> len(t))) AS DOUBLE)
    / CAST(GREATEST(len({_D_BPE}), 1) AS DOUBLE) AS avg_token_len,
  CAST(len(list_distinct({_D_BPE})) AS DOUBLE)
    / CAST(GREATEST(len({_D_BPE}), 1) AS DOUBLE) AS unique_ratio
FROM documents
"""


def q29_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: raw content hash, whitespace-normalized
    hash, and min-shingle-hash (the min-hash-of-one-permutation rolling
    fingerprint used for cheap near-dup bucketing).
    """
    d = widen(load(spark, sf_dir, "documents"))
    # bind the token array once; multi-referenced non-trivial aliases
    # are not re-inlined by CollapseProject, so the regex split runs
    # one time per row instead of three
    with_toks = d.select(
        "doc_id", "text", _tokens(F.col("text")).alias("toks")
    )
    shingle_hashes = F.transform(
        _shingles(F.col("toks")), lambda s: F.md5(s)
    )
    return with_toks.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_hash"),
        F.md5(F.concat_ws(" ", F.col("toks"))).alias("normalized_hash"),
        F.array_min(shingle_hashes).alias("min_shingle_hash"),
        F.size(shingle_hashes).alias("n_shingles"),
    )


Q29_SQL = f"""
SELECT doc_id,
  md5(text) AS content_hash,
  md5(array_to_string({_D_TOKS}, ' ')) AS normalized_hash,
  list_sort(list_transform({_D_SHINGLES}, s -> md5(s)))[1] AS min_shingle_hash,
  len({_D_SHINGLES}) AS n_shingles
FROM documents
"""


JACCARD_THRESHOLD = 0.2


def q30_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup detection over candidate pairs
    from (lang, source) blocking (beyond-reference dedup operator).

    |A∩B| as JVM ``array_intersect`` over per-doc distinct-shingle hash
    sets, |A∪B| = |A|+|B|-|A∩B| — all integer-exact. At 100 TB the
    blocking key becomes the LSH band (q32) instead of dimension
    columns; the verify math is identical.

    Plan shape: ONE tokenize+shingle+hash pass (a self-join would run
    it twice — Catalyst does not share the derivation across join
    sides), one shuffle collecting each block's (doc_id, sh) structs,
    then every within-block pair AND its intersection are generated
    map-side inside a nested ``transform``; the threshold filter reads
    the already-materialized struct fields, so the intersect evaluates
    exactly once per pair (no double evaluation, no window barrier).

    Scale contract: a block must fit in one task (collect_list). That
    is inherent to blocked all-pairs — a block too big to collect is
    also too big to pair quadratically — so blocking keys must bound
    block size; for heavy blocks use banded LSH (q32), which re-blocks
    by signature and keeps buckets tiny.
    """
    docs = widen(load(spark, sf_dir, "documents"))
    # distinct shingle SET per doc as an array of 64-bit hashes: ~10x
    # smaller than the strings, and counts equal the string-set counts
    # unless xxhash64 collides within a pair's ~200 shingles
    # (P ~ 2e-15) — the DuckDB oracle keeps exact strings, so a
    # collision would surface as a diff.
    sh_arr = docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.transform(
                _shingles(_tokens(F.col("text"))), lambda s: F.xxhash64(s)
            )
        ).alias("sh"),
    )
    blocks = (
        # ONE exchange: the explicit key repartition both spreads the
        # quadratic pair work across the cluster (AQE never coalesces an
        # explicit repartition, unlike the ENSURE_REQUIREMENTS exchange a
        # bare groupBy gets) and satisfies the aggregation's clustering,
        # so the doc->block shuffle and the pair stage share it. The old
        # shape (groupBy, then round-robin repartition of the collected
        # blocks) shuffled every block payload a second time (guide §2.4).
        sh_arr.repartition(
            spark.sparkContext.defaultParallelism, "lang", "source"
        )
        .groupBy("lang", "source")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sh"))).alias("ds"))
    )
    n = F.size("ds")
    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + F.lit(2), n),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    y["doc_id"].alias("id_b"),
                    F.size(F.array_intersect(x["sh"], y["sh"])).alias("n_inter"),
                    (F.size(x["sh"]) + F.size(y["sh"])).alias("n_ab"),
                ),
            ),
        )
    )
    stats = blocks.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        F.col("p.n_inter").alias("n_inter"),
        (F.col("p.n_ab") - F.col("p.n_inter")).alias("n_union"),
    )
    return stats.withColumn(
        "jaccard",
        F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


Q30_SQL = f"""
WITH docs AS (
  SELECT doc_id, lang, source, {_D_SHINGLES} AS sh FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM docs)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM docs a JOIN docs b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
), inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.n_inter,
  na.n_sh + nb.n_sh - i.n_inter AS n_union,
  CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""


SIMHASH_BITS = 32
HAMMING_THRESHOLD = 8


def q31_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection: 32-bit fingerprint from md5-derived
    token hashes (portable across engines, unlike xxhash64), then
    within-source pairs under a Hamming-distance threshold
    (beyond-reference dedup operator).

    Fingerprint bit j = sign of sum over distinct tokens of
    (bit_j(hash(token)) ? +1 : -1). One map-side fingerprint pass, one
    shuffle to per-source blocks, pairs + Hamming generated map-side.
    """
    d = widen(load(spark, sf_dir, "documents")).select("doc_id", "source", "text")
    # map-side fingerprint: hash the distinct-token array ONCE (alias
    # barrier keeps md5 from re-evaluating per bit), then 32 integer
    # array-aggregates derive the per-bit sums — no explode, no
    # per-token shuffle; the only shuffle left is the pair join. Same
    # exact integer sums as the exploded groupBy, so the DuckDB oracle
    # is unchanged.
    hashed = d.select(
        "doc_id",
        "source",
        F.transform(
            F.array_distinct(_tokens(F.col("text"))),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("h"),
    )
    # single-pass fingerprint: ONE traversal of the token-hash array
    # carries all 32 signed bit counters in an array accumulator
    # (zip_with against a literal mask array), ~1.5x faster than 32
    # separate F.aggregate passes and identical integer math
    masks = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    sums = F.aggregate(
        "h",
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, x: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(x.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            sums, masks, lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    fps = hashed.select("doc_id", "source", fp.alias("simhash"))
    # block-collect pair stage (same shape as q30): a self-join would
    # run the fingerprint derivation twice — once per join side — so
    # instead ONE derivation pass feeds a per-source collect_list and
    # within-block pairs are generated map-side. The Hamming filter
    # runs INSIDE the array expression (bit_count on scalars, ~free),
    # so only surviving pairs allocate result structs — at sf0.1 that
    # skips struct-building for the ~70% of 1.25M pairs that fail.
    # Fingerprints are 12-byte scalars, so even million-doc sources
    # collect in tens of MB; beyond that, re-block on simhash prefix
    # bands (the standard SimHash index).
    blocks = (
        # one exchange shared by the block collect and the pair stage
        # (see q30): key repartition instead of groupBy + round-robin
        fps.repartition(spark.sparkContext.defaultParallelism, "source")
        .groupBy("source")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds"))
    )
    n = F.size("ds")
    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.filter(
                    F.slice("ds", i + F.lit(2), n),
                    lambda y: F.bit_count(
                        x["simhash"].bitwiseXOR(y["simhash"])
                    )
                    <= HAMMING_THRESHOLD,
                ),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    y["doc_id"].alias("id_b"),
                    x["simhash"].alias("simhash_a"),
                    y["simhash"].alias("simhash_b"),
                    F.bit_count(
                        x["simhash"].bitwiseXOR(y["simhash"])
                    ).alias("hamming"),
                ),
            ),
        )
    )
    return blocks.select(F.explode(pair_structs).alias("p")).select("p.*")


_D_SIMHASH_SUMS = ", ".join(
    f"SUM(CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(SIMHASH_BITS)
)
_D_SIMHASH_FP = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
)

Q31_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, unnest(list_distinct({_D_TOKS})) AS t FROM documents
), hashed AS (
  SELECT doc_id, source, ('0x' || substr(md5(t), 1, 8))::UBIGINT AS h FROM tok
), per_doc AS (
  SELECT doc_id, source, {_D_SIMHASH_SUMS} FROM hashed GROUP BY 1, 2
), fps AS (
  SELECT doc_id, source, CAST({_D_SIMHASH_FP} AS BIGINT) AS simhash FROM per_doc
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  a.simhash AS simhash_a, b.simhash AS simhash_b,
  bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT))::INT AS hamming
FROM fps a JOIN fps b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= {HAMMING_THRESHOLD}
"""


MINHASH_K = 16
MINHASH_BANDS = 4


def q32_minhash_lsh(
    spark: SparkSession, sf_dir: str, scheme: str = "portable"
) -> DataFrame:
    """MinHash + banded LSH candidate generation, then exact Jaccard
    verification — the full fuzzy-dedup pipeline at scale
    (shingle -> signature -> band-bucket join -> verify; SURVEY §7
    phase 7). Signatures use engine-portable double hashing (one md5
    per shingle split into 56-bit halves h1/h2; seed k = min(h1+k*h2),
    Kirsch-Mitzenmacher), so the WHOLE pipeline — buckets, candidates,
    verify — has an exact DuckDB oracle (Q32_SQL).

    Plan shape: ONE tokenize+shingle+md5 pass produces the per-doc
    (h1,h2) array; the k seeded minhashes AND the band hashes AND the
    verify intersect all derive from that aliased array (a
    multi-referenced alias is not re-inlined by CollapseProject).
    The LSH join shuffles on (band, band_hash) carrying the ~1 KB
    hash-set payload — at 100 TB swap the payload join for a re-join
    against the doc table on id to keep the bucket shuffle narrow.
    (Generic library forms: ``operators.dedup.minhash_lsh_pairs`` /
    ``ngram_jaccard``.)
    """
    from ..operators.dedup import band_hash, hash_pairs, minhash_sig_array

    docs = widen(load(spark, sf_dir, "documents"))
    rows_per_band = MINHASH_K // MINHASH_BANDS
    base = docs.select(
        "doc_id",
        hash_pairs(_shingles(_tokens(F.col("text"))), scheme).alias("hp"),
    )
    sig = base.select(
        "doc_id",
        F.array_distinct(F.transform(F.col("hp"), lambda p: p["h1"])).alias(
            "sh"
        ),
        minhash_sig_array(F.col("hp"), MINHASH_K).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    band_hash(F.col("sig"), b, rows_per_band, scheme)
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # bucket-collect candidate stage (q30/q31 shape): a band self-join
    # would derive sig+sh twice and shuffle the shingle payloads on
    # both sides; instead buckets collect once per (band, band_hash)
    # and pairs + the exact-Jaccard verify run map-side inside the
    # bucket. The >= 0.5 filter sits inside the array expression, so
    # only verified pairs leave the bucket — the final dropDuplicates
    # (a true pair can collide in several bands) shuffles a handful of
    # scalar rows. LSH buckets are tiny by construction (that is the
    # point of banding), so collect_list per bucket is bounded.
    buckets = (
        # one exchange shared by the bucket collect and the verify stage
        # (see q30): key repartition instead of groupBy + round-robin —
        # the banded payload crosses the wire once, not twice
        banded.repartition(
            spark.sparkContext.defaultParallelism, "band", "band_hash"
        )
        .groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sh"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    n = F.size("ds")

    def _jac(x, y) -> Column:
        ni = F.size(F.array_intersect(x["sh"], y["sh"]))
        nu = F.size(x["sh"]) + F.size(y["sh"]) - ni
        return ni.cast("double") / nu.cast("double")

    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.filter(
                    F.slice("ds", i + F.lit(2), n), lambda y: _jac(x, y) >= 0.5
                ),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    y["doc_id"].alias("id_b"),
                    _jac(x, y).alias("jaccard"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.*")
        .dropDuplicates(["id_a", "id_b"])
    )


# DuckDB mirror of the portable MinHash pipeline: identical int64
# double-hash arithmetic, band hashing, bucket candidates, and exact
# Jaccard over the distinct-h1 sets.
_MH_RPB = MINHASH_K // MINHASH_BANDS
_MH_SIG_COLS = ", ".join(
    f"MIN(h1 + {k} * h2) AS s{k}" for k in range(MINHASH_K)
)
_MH_BANDED = "\n  UNION ALL\n  ".join(
    "SELECT doc_id, {b} AS band, ('0x' || substr(md5({cat}), 1, 14))::BIGINT"
    " AS band_hash FROM sig".format(
        b=b,
        cat=" || ',' || ".join(
            f"CAST(s{i} AS VARCHAR)"
            for i in range(b * _MH_RPB, (b + 1) * _MH_RPB)
        ),
    )
    for b in range(MINHASH_BANDS)
)
_MH_CTES = f"""
sh0 AS (
  SELECT doc_id, unnest({_D_SHINGLES}) AS s FROM documents
), shing AS (
  SELECT DISTINCT doc_id,
    ('0x' || substr(md5(s), 1, 14))::BIGINT AS h1,
    ('0x' || substr(md5(s), 17, 14))::BIGINT AS h2
  FROM sh0
), sig AS (
  SELECT doc_id, {_MH_SIG_COLS} FROM shing GROUP BY doc_id
), banded AS (
  {_MH_BANDED}
), sh1 AS (
  SELECT DISTINCT doc_id, h1 FROM shing
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh1 GROUP BY 1
)"""


def _mh_verify_select(extra_pred: str = "") -> str:
    return f"""
, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id{extra_pred}
), inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh1 a ON a.doc_id = c.id_a
  JOIN sh1 b ON b.doc_id = c.id_b AND b.h1 = a.h1
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
  CAST(i.n_inter AS DOUBLE)
    / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE)
    / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= 0.5
"""


Q32_SQL = "WITH " + _MH_CTES + _mh_verify_select()


def q43_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS: connected components over
    the q30 Jaccard pair graph (min-label propagation,
    ``operators/graph.py``), every document labeled with its
    component's minimum doc_id and the canonical survivor flagged.
    This is the step that makes pair-finding an actual dedup: keep
    ``is_canonical`` rows, drop the rest.

    Iterative (join + groupBy-min per round, lineage truncated with
    localCheckpoint) — the oracle is a DuckDB recursive CTE computing
    the same min-reachable-id labeling.
    """
    from ..operators.graph import dedup_clusters

    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = q30_ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return dedup_clusters(pairs, docs).select(
        "doc_id", "cluster_id", "is_canonical"
    )


Q43_SQL = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, lang, source, list_distinct({_D_SHINGLES}) AS sh FROM documents
), sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM docs
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.sh, b.sh)) AS n_inter
  FROM docs a JOIN docs b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
), pairs_t AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sizes na ON na.doc_id = c.id_a
  JOIN sizes nb ON nb.doc_id = c.id_b
  WHERE CAST(c.n_inter AS DOUBLE)
        / CAST(na.n_sh + nb.n_sh - c.n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs_t
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs_t
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id,
       MIN(label) = node AS is_canonical
FROM reach GROUP BY node
"""


def q44_incremental_dedup(
    spark: SparkSession, sf_dir: str, scheme: str = "portable"
) -> DataFrame:
    """Incremental near-dup detection: a NEW ingest batch (20% of the
    documents table, deterministic ``doc_id % 5`` split) probed against
    a persistent MinHash-LSH index of the remaining corpus
    (``operators.dedup.minhash_index`` / ``incremental_near_dup_pairs``).

    This is the steady-state 100 TB dedup shape: the quadratic
    full-corpus pass (q32) runs once to bootstrap the index; every
    later ingest pays O(batch) signature derivation + a broadcast
    probe of the bucketed index — NO corpus re-tokenization and NO
    corpus-side shuffle. Signatures use the same portable md5 double
    hash as q32, so the probe result has an exact DuckDB oracle
    (Q44_SQL: bucket-collision pairs where at least one side is in the
    batch); the probe-vs-full-pass equivalence is additionally pinned
    by ``tests/test_incremental_dedup.py``.
    """
    from ..operators.dedup import incremental_near_dup_pairs, minhash_index

    docs = widen(load(spark, sf_dir, "documents")).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    index = minhash_index(corpus, "doc_id", "text", scheme=scheme)
    return incremental_near_dup_pairs(
        batch, index, "doc_id", "text", 0.5, scheme=scheme
    )


# Same portable-MinHash CTEs as Q32_SQL; the candidate stage keeps only
# pairs touching the ingest batch (doc_id % 5 = 4) — exactly the
# corpus-probe + within-batch union the Spark operator produces.
Q44_SQL = (
    "WITH "
    + _MH_CTES
    + _mh_verify_select(
        "\n   AND (a.doc_id % 5 = 4 OR b.doc_id % 5 = 4)"
    )
)


def q45_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content hash
    (beyond-reference training-data surface): every doc lands in the
    same split regardless of partition layout, row order, or later
    appends — unlike ``randomSplit``, whose assignment shifts with the
    physical plan. Verified bit-identically by the DuckDB oracle
    running the same int64 hash arithmetic.

    Pure map-side projection + one O(3-group) aggregation; the hash
    never overflows int64 under ANSI mode for any bigint id.
    """
    from ..operators.sampling import hash_split

    # no widen(): the split assignment is one xxhash64 of the id —
    # nothing CPU-heavy to parallelize, and the repartition would
    # shuffle the full row (text included) just to reach a 3-group
    # aggregate that partial-aggregates map-side anyway (guide §2.4;
    # measured 0.32-0.36 -> 0.20-0.27 s warm without it)
    d = load(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum("n_chars").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def _q45_sql() -> str:
    from ..operators.sampling import split_column_sql

    case = split_column_sql("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return f"""
SELECT {case} AS split, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars,
  COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY 1
"""


Q45_SQL = _q45_sql()


_MIX_TARGETS = {"en": 0.5, "fr": 0.3, "es": 0.2}


def q46_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling (beyond-reference training-data
    surface): downsample the documents table to a 50/30/20 en/fr/es
    corpus using append-stable per-domain hash sampling. Keep/drop
    reads only (lang, hash(doc_id)), so the sampled corpus is
    reproducible across engines — the oracle re-runs the identical
    threshold arithmetic in DuckDB.

    One |domains|-row count agg picks thresholds; the sample itself is
    a map-side filter that pipelines into the scan (no data shuffle).
    """
    from ..operators.sampling import mixture_sample

    # no widen(): keep/drop is one hash-bucket comparison per row (see
    # q45 — the exchange cost more than it parallelized; measured
    # 0.46-0.56 -> 0.27-0.35 s warm without it)
    d = load(spark, sf_dir, "documents")
    return (
        mixture_sample(d, "doc_id", "lang", _MIX_TARGETS)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


def _q46_sql() -> str:
    # Mirror mixture_fractions in SQL: per-lang counts -> feasible
    # output size bounded by the scarcest lang -> per-lang keep
    # thresholds -> identical hash predicate per row.
    from ..operators.sampling import hash_bucket_sql

    shares = ", ".join(
        f"('{d}', {s})" for d, s in _MIX_TARGETS.items()
    )
    bucket = hash_bucket_sql("doc_id", 1_000_000)
    return f"""
WITH shares(lang, share) AS (VALUES {shares}),
counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
),
feasible AS (
  SELECT MIN(CAST(n AS DOUBLE) / CAST(share AS DOUBLE)) AS n_out
  FROM counts JOIN shares USING (lang)
),
thresholds AS (
  -- same IEEE double ops, same order, same floor(x+0.5) rounding as
  -- mixture_fractions/mixture_sample on the Spark side
  SELECT lang,
    CAST(FLOOR(LEAST(1.0, (CAST(share AS DOUBLE) * n_out) / CAST(n AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS thresh
  FROM counts JOIN shares USING (lang) CROSS JOIN feasible
)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents JOIN thresholds USING (lang)
WHERE {bucket} < thresh
GROUP BY lang
"""


Q46_SQL = _q46_sql()


PACK_BUDGET = 2048
PACK_BUCKETS = 32


def q47_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches (beyond-reference
    LLM-pipeline surface): deal documents into hash buckets, order
    each bucket with the deterministic shuffle key, cut the
    concatenated token stream at 2048-token boundaries, and report
    per-bucket packing efficiency. Every assignment reads only
    (doc_id, token_count), so the batch layout reproduces across
    engines — the oracle reruns the identical window arithmetic.

    One hash-partition shuffle + the window sort; token counting is
    map-side regex (q28's lexer). Whole-doc first-fit lives in
    ``operators.packing.pack_greedy`` (per-bucket applyInPandas).
    """
    from ..operators.packing import pack_chunked, pack_stats

    d = widen(load(spark, sf_dir, "documents"))
    docs = d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("n_tokens"),
    )
    packed = pack_chunked(docs, "doc_id", "n_tokens", PACK_BUDGET, PACK_BUCKETS)
    return pack_stats(packed, "n_tokens", PACK_BUDGET)


def _q47_sql() -> str:
    from ..operators.packing import pack_chunked_sql

    bucket, seq = pack_chunked_sql("doc_id", "n_tokens", PACK_BUDGET, PACK_BUCKETS)
    return f"""
WITH toks AS (
  SELECT doc_id, len({_D_BPE}) AS n_tokens FROM documents
), packed AS (
  SELECT doc_id, n_tokens, {bucket} AS pack_bucket, {seq} AS seq_id FROM toks
), per_seq AS (
  SELECT pack_bucket, seq_id, COUNT(*) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
  FROM packed GROUP BY 1, 2
), marked AS (
  SELECT *, seq_id = MAX(seq_id) OVER (PARTITION BY pack_bucket) AS is_open
  FROM per_seq
)
SELECT pack_bucket, COUNT(*) AS n_seqs, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
  CAST(SUM(seq_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN NOT is_open THEN seq_tokens ELSE 0 END) AS DOUBLE)
    / (CAST(GREATEST(SUM(CASE WHEN NOT is_open THEN 1 ELSE 0 END), 1) AS DOUBLE)
       * {float(PACK_BUDGET)}) AS closed_fill_ratio
FROM marked GROUP BY 1
"""


Q47_SQL = _q47_sql()


TEXT_QUERIES = {
    "q27_language_id": (q27_language_id, Q27_SQL),
    "q28_token_stats": (q28_token_stats, Q28_SQL),
    "q30_ngram_jaccard_pairs": (q30_ngram_jaccard_pairs, Q30_SQL),
    "q31_simhash_pairs": (q31_simhash_pairs, Q31_SQL),
    "q32_minhash_lsh": (q32_minhash_lsh, Q32_SQL),
    "q43_dedup_clusters": (q43_dedup_clusters, Q43_SQL),
    "q44_incremental_dedup": (q44_incremental_dedup, Q44_SQL),
    "q45_hash_split": (q45_hash_split, Q45_SQL),
    "q46_mixture_sample": (q46_mixture_sample, Q46_SQL),
    "q47_sequence_packing": (q47_sequence_packing, Q47_SQL),
}


def _q32_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q32_minhash_lsh(spark, sf_dir, scheme="fast")


def _q44_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q44_incremental_dedup(spark, sf_dir, scheme="fast")


# Production-mode variants of the dual-hash queries: same operator and
# plan shape, xxhash64 signatures instead of the oracle's md5 (see
# operators/dedup.py module docstring). bench.py times THESE — the
# production configuration a 100 TB deployment runs — while the
# correctness gate keeps validating the portable scheme, whose values
# DuckDB can reproduce exactly.
PRODUCTION_OVERRIDES = {
    "q32_minhash_lsh": _q32_fast,
    "q44_incremental_dedup": _q44_fast,
}
