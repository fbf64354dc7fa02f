"""Standardization/cleaning expression library (P5-P9 in SURVEY §2.3).

Column-in/column-out builders mirroring the silver-layer cleaning in
``/root/reference/src/silver/transform_customers.py:81-124`` — every
helper returns a Catalyst expression (JVM-side, codegen-friendly), so
they compose into a single projection with zero Python row-path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def clean_email(email: Column) -> Column:
    """lower(trim(email)), nulls preserved
    (``transform_customers.py:84-88``)."""
    return F.lower(F.trim(email))


def valid_email(email: Column) -> Column:
    return email.rlike(EMAIL_RE)


def clean_phone(phone: Column) -> Column:
    """Strip everything but digits and '+'
    (``transform_customers.py:94``)."""
    return F.regexp_replace(phone, "[^0-9+]", "")


def full_name(first: Column, last: Column) -> Column:
    """initcap parts joined with a single space; null-safe via
    concat_ws (``transform_customers.py:91``)."""
    return F.concat_ws(" ", F.initcap(F.trim(first)), F.initcap(F.trim(last)))


def validate_domain(value: Column, allowed: list[str], fallback: str = "unknown") -> Column:
    """Domain whitelist with fallback (loyalty-tier validation,
    ``transform_customers.py:97-101``)."""
    return F.when(
        F.lower(value).isin([a.lower() for a in allowed]), F.lower(value)
    ).otherwise(F.lit(fallback))


def standardize_strings(*cols: Column) -> list[Column]:
    """trim + collapse internal whitespace for each column."""
    return [F.regexp_replace(F.trim(c), r"\s+", " ") for c in cols]


def email_domain(email: Column) -> Column:
    """``SPLIT(email, '@')[1]`` (``governance/access_control.py:119``)."""
    return F.split(email, "@").getItem(1)
