"""PII-redaction catalog entry (q51): distributed in-text scrubbing
with an exact DuckDB oracle.

The reference's PII handling is driver-side classification plus
column-level masking (``data_classification.py:236-261``,
``compliance_policies.py``); a 100 TB training-data pipeline also needs
the DATA-PLANE half — scrub emails/SSNs/phones inside free text while
the corpus streams through. q51 exercises
``governance.pii.redact_pii`` end-to-end: synthesize deterministic
PII-bearing support-ticket text from the customer table (the fixtures
carry no real PII — same synthesis-from-columns trick as q42's binary
payloads), redact it, and roll up per market segment.

Determinism/oracle design: the synthesized text is a pure string
expression of customer columns, the patterns are RE2-compatible (no
backreferences/lookaround), and every metric is an integer count or
length sum — Spark's Java regex and DuckDB's RE2 agree exactly.

Scale shape: widen() then zero shuffles before the |segments|-row
rollup; synthesis + three ``regexp_replace`` + two
``regexp_extract_all`` all fuse into whole-stage codegen — no Python,
no UDF. The widen matters at fixture scale only: the customer file is
ONE split, so without it the whole 7-regex chain serializes through a
single core (measured 0.72 -> 0.41-0.50 s warm, both A/B orders); at
100 TB the scan is already wide and widen is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..governance.pii import PII_TEXT_PATTERNS, redact_pii
from .catalog import load, widen


def _ticket_text(c):
    """Deterministic PII-bearing text from customer columns:
    'cust000000042@example.com called +1-555-0042 about ssn
    042-00-0042 (balance ...)'."""
    tag = F.lower(F.regexp_replace(c["c_name"], "Customer#", "cust"))
    d4 = F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0")
    d3 = F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0")
    d2 = F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0")
    return F.concat(
        tag, F.lit("@example.com called +1-555-"), d4,
        F.lit(" about ssn "), d3, F.lit("-"), d2, F.lit("-"), d4,
        # integer cents: double->string formatting differs between
        # engines; a bigint renders identically in both
        F.lit(" (balance "),
        F.floor(F.col("c_acctbal") * 100).cast("long").cast("string"),
        F.lit(" cents)"),
    )


def q51_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = widen(load(spark, sf_dir, "customer"))
    text = _ticket_text(c)
    with_text = c.select(
        "c_mktsegment",
        text.alias("ticket"),
        redact_pii(text).alias("clean"),
    )
    email_pat = PII_TEXT_PATTERNS["email"]
    ssn_pat = PII_TEXT_PATTERNS["ssn"]
    return (
        with_text.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_tickets"),
            F.sum(
                F.size(F.regexp_extract_all("ticket", F.lit(email_pat), F.lit(0)))
            ).alias("emails_found"),
            F.sum(
                F.size(F.regexp_extract_all("ticket", F.lit(ssn_pat), F.lit(0)))
            ).alias("ssns_found"),
            F.sum(
                F.size(F.regexp_extract_all("clean", F.lit(email_pat), F.lit(0)))
            ).alias("emails_left"),
            F.sum(F.length("clean")).alias("clean_len"),
        )
    )


Q51_SQL = f"""
WITH t AS (
    SELECT c_mktsegment,
           lower(replace(c_name, 'Customer#', 'cust')) || '@example.com called +1-555-'
             || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' about ssn ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
             || '-' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')
             || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' (balance ' || CAST(CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS VARCHAR) || ' cents)' AS ticket
    FROM customer
), r AS (
    SELECT c_mktsegment, ticket,
           regexp_replace(
             regexp_replace(
               regexp_replace(ticket, '{PII_TEXT_PATTERNS["email"]}', '[EMAIL]', 'g'),
               '{PII_TEXT_PATTERNS["ssn"]}', '[SSN]', 'g'),
             '{PII_TEXT_PATTERNS["phone"]}', '[PHONE]', 'g') AS clean
    FROM t
)
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_tickets,
       CAST(SUM(len(regexp_extract_all(ticket, '{PII_TEXT_PATTERNS["email"]}'))) AS BIGINT) AS emails_found,
       CAST(SUM(len(regexp_extract_all(ticket, '{PII_TEXT_PATTERNS["ssn"]}'))) AS BIGINT) AS ssns_found,
       CAST(SUM(len(regexp_extract_all(clean, '{PII_TEXT_PATTERNS["email"]}'))) AS BIGINT) AS emails_left,
       CAST(SUM(len(clean)) AS BIGINT) AS clean_len
FROM r
GROUP BY c_mktsegment
"""


REDACTION_QUERIES = {
    "q51_pii_redaction": (q51_pii_redaction, Q51_SQL),
}
