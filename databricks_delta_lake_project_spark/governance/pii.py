"""PII discovery + column classification (reference
``governance/data_classification.py:141-207``): sample-based regex
scan over string columns, emitting (column, pii_type, hit_rate) and a
classification tag map stored engine-side (SURVEY §2.11 X9 — Unity
Catalog tags become an engine metadata table).

The scan samples ``limit(n).toPandas()`` exactly like the reference —
a driver-side sample is the right cost model for classification; the
full-table path would be a single conditional aggregate if exact rates
were ever needed.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

PII_PATTERNS: dict[str, str] = {
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "phone": r"^\+?[0-9 ().-]{7,20}$",
    "ssn": r"^\d{3}-\d{2}-\d{4}$",
    "ip_address": r"^(\d{1,3}\.){3}\d{1,3}$",
    "credit_card": r"^\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}$",
}


def pii_scan(
    df: DataFrame, sample_rows: int = 100, min_hit_rate: float = 0.5
) -> list[dict[str, Any]]:
    """Scan string columns of a sample; a column is flagged as a PII
    type when >= ``min_hit_rate`` of its non-null sampled values match
    that type's regex (``data_classification.py:148-198``)."""
    string_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    if not string_cols:
        return []
    sample = df.select(*string_cols).limit(sample_rows).toPandas()
    findings: list[dict[str, Any]] = []
    for col in string_cols:
        values = [v for v in sample[col].tolist() if v is not None]
        if not values:
            continue
        for pii_type, pattern in PII_PATTERNS.items():
            rx = re.compile(pattern)
            hits = sum(1 for v in values if rx.match(str(v)))
            rate = hits / len(values)
            if rate >= min_hit_rate:
                findings.append(
                    {
                        "column": col,
                        "pii_type": pii_type,
                        "hit_rate": rate,
                        "n_sampled": len(values),
                    }
                )
    return findings


def classify_columns(
    df: DataFrame, sample_rows: int = 100
) -> dict[str, str]:
    """Column -> tag map ('pii.<type>' or 'non_pii'), the engine-side
    stand-in for UC column tags (``data_classification.py:236-261``)."""
    found = {f["column"]: f["pii_type"] for f in pii_scan(df, sample_rows)}
    return {
        f.name: (f"pii.{found[f.name]}" if f.name in found else "non_pii")
        for f in df.schema.fields
    }


# Unanchored variants of PII_PATTERNS for IN-TEXT detection/redaction
# (the anchored set classifies whole column values). Kept RE2-compatible
# (no backreferences/lookaround) so the same patterns run verbatim in
# Spark's Java regex AND the DuckDB oracle.
PII_TEXT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
    "phone": r"\+\d{1,2}-\d{3}-\d{4}",
}


def redact_pii(col):
    """Distributed PII redaction: replace every in-text email/SSN/phone
    with a typed placeholder — the data-plane complement to the
    driver-side ``pii_scan`` classifier (reference surface:
    ``compliance_policies.py`` anonymization). Pure
    ``regexp_replace`` chain: JVM-side, whole-stage-codegen, no Python
    in the hot path — at 100 TB this is a free map stage fused into
    the scan. Order matters: SSN before phone (an SSN's tail would
    otherwise partially match loose phone shapes)."""
    from pyspark.sql import functions as F

    out = F.regexp_replace(col, PII_TEXT_PATTERNS["email"], "[EMAIL]")
    out = F.regexp_replace(out, PII_TEXT_PATTERNS["ssn"], "[SSN]")
    out = F.regexp_replace(out, PII_TEXT_PATTERNS["phone"], "[PHONE]")
    return out
