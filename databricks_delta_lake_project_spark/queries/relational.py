"""Relational operator coverage beyond the core catalog: scalar/string
cleaning, semi-joins, top-k join pipelines, ranked windows, rollup,
pivot, set intersection, as-of join, percentile binning, multi-table
stats, and single-pass quality metrics.

Every query follows the cross-engine parity rules documented in
``catalog.py`` (exact DECIMAL money math, deterministic IEEE ratio
expressions, unique tiebreaks, identical aliases in Spark and oracle
SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _dec, load


def q16_customer_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver-style standardization (P5-P9 in SURVEY §2.3; reference
    ``src/silver/transform_customers.py:81-124``): trim/case
    normalization, regex digit extraction, synthetic email + domain
    split, exact 2-dp money, CASE tier, rlike validation.

    All expressions are built-ins inside one whole-stage-codegen
    projection — no shuffle, no UDFs; at 100 TB this is a pure map
    stage pipelined into the scan.
    """
    c = load(spark, sf_dir, "customer")
    digits = F.regexp_replace(F.col("c_name"), "[^0-9]", "")
    email = F.concat(F.lit("cust"), digits, F.lit("@customer.example"))
    acct = _dec("c_acctbal").cast("double")
    tier = (
        F.when(F.col("c_acctbal") > 7500, "high")
        .when(F.col("c_acctbal") > 2500, "mid")
        .when(F.col("c_acctbal") >= 0, "low")
        .otherwise("negative")
    )
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.lower(F.trim(F.col("c_name"))).alias("name_lower"),
        F.initcap(F.lower(F.col("c_mktsegment"))).alias("segment_label"),
        digits.alias("name_digits"),
        email.alias("email"),
        F.split(email, "@").getItem(1).alias("email_domain"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("")), F.lit("unknown")).alias(
            "segment_raw"
        ),
        acct.alias("acctbal"),
        tier.alias("balance_tier"),
        F.col("c_name").rlike("^Customer#[0-9]+$").alias("is_valid_name"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
    )


Q16_SQL = """
SELECT c_custkey AS customer_id,
  lower(trim(c_name)) AS name_lower,
  array_to_string(list_transform(string_split(lower(c_mktsegment), ' '),
      w -> upper(w[1]) || w[2:]), ' ') AS segment_label,
  regexp_replace(c_name, '[^0-9]', '', 'g') AS name_digits,
  'cust' || regexp_replace(c_name, '[^0-9]', '', 'g') || '@customer.example' AS email,
  string_split('cust' || regexp_replace(c_name, '[^0-9]', '', 'g') || '@customer.example', '@')[2] AS email_domain,
  COALESCE(NULLIF(c_mktsegment, ''), 'unknown') AS segment_raw,
  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
  CASE WHEN c_acctbal > 7500 THEN 'high'
       WHEN c_acctbal > 2500 THEN 'mid'
       WHEN c_acctbal >= 0 THEN 'low'
       ELSE 'negative' END AS balance_tier,
  regexp_matches(c_name, '^Customer#[0-9]+$') AS is_valid_name,
  substr(c_name, 1, 8) AS name_prefix
FROM customer
"""


def q17_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) + grouped count, TPC-H-Q4 shape (J-family gap
    noted in SURVEY §2.4: semi semantics appear as IN-filters, e.g.
    ``sql_alerts_monitoring.py:93-99``).

    left_semi never widens rows — Spark builds the distinct key set on
    the probe side; at scale the semi-join shuffles once on l_orderkey.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = li.filter(
        F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("l_orderkey")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q17_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= TIMESTAMP '1999-01-01')
GROUP BY o_orderpriority
"""


def q18_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter -> 3-way join -> group -> ordered top-10 (TPC-H-Q3 shape;
    J3/O1/O2 pipeline like ``sql_queries_and_dashboards.py:182-199``).

    orderBy().limit() compiles to TakeOrderedAndProject: per-partition
    top-k, then a k*partitions driver merge — no global sort at scale.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(12,2)")
    revenue = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_id").asc())
        .limit(10)
    )


Q18_SQL = """
SELECT l.l_orderkey AS order_id, CAST(o.o_orderdate AS DATE) AS order_date,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '2000-01-01'
  AND l.l_shipdate > TIMESTAMP '2000-01-01'
GROUP BY 1, 2
ORDER BY revenue DESC, order_id ASC
LIMIT 10
"""


def q19_brand_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned rank window: top-3 parts per brand by revenue
    (extends W-family — reference uses only row_number/ntile, SURVEY
    §2.6 note).

    The window partitions by brand, so ranking distributes across the
    brand keyspace; the part dimension is broadcast.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    per_part = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_name")),
                li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        per_part.withColumn("brand_rank", F.rank().over(w))
        .filter(F.col("brand_rank") <= 3)
        .select("p_brand", "brand_rank", "p_partkey", "p_name", "revenue", "n_lines")
    )


Q19_SQL = """
WITH per_part AS (
  SELECT p.p_brand, p.p_partkey, p.p_name,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_lines
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2, 3
)
SELECT p_brand, brand_rank, p_partkey, p_name, revenue, n_lines
FROM (
  SELECT *, RANK() OVER (PARTITION BY p_brand
                         ORDER BY revenue DESC, p_partkey ASC) AS brand_rank
  FROM per_part
) WHERE brand_rank <= 3
"""


def q20_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals region -> nation -> grand total
    (extends A5 — reference uses plain group-by only, SURVEY §2.5 A5
    note; rollup is the idiomatic Spark form of its stacked dashboards).

    Rollup computes all grouping sets in one shuffle; partial
    aggregation applies per grouping set.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dims = (
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        o.join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


Q20_SQL = """
SELECT r.r_name, n.n_name,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


EVENT_TYPES = ("view", "click", "purchase", "error")


def q21_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types to columns (``DataFrame.pivot`` with an
    explicit value list so the plan needs no extra value-discovery
    job; semantics of A2 conditional counts,
    ``transform_clickstream.py:111-114``)."""
    e = load(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


Q21_SQL = """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id
"""


def q22_viewer_buyer_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (SURVEY §2.7 notes INTERSECT unused by the
    reference — covered here for completeness next to O4 EXCEPT)."""
    e = load(spark, sf_dir, "events")
    viewers = e.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.intersect(buyers)


Q22_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


def q23_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: each event picks the user's latest
    order at-or-before the event timestamp — leakage-safe feature
    lookup (J9; reference ``src/ml_operations/feature_store.py:186-201``
    ``timestamp_lookup_key`` semantics).

    Implementation: the union-sort as-of pattern. A range left-join
    multiplies every event by its user's full order history before a
    row_number throws all but one row away; instead events and orders
    union into one per-user timeline (orders sort before events at
    equal timestamps, larger orderkey later so it wins ties) and a
    running ``last(order_struct, ignorenulls)`` carries the most
    recent at-or-before order onto each event row. One shuffle on the
    user key, zero row multiplication — per-user history depth only
    affects sort width, never output rows.
    """
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    ord_struct = F.struct("o_orderdate", "o_orderkey", "o_totalprice")
    ord_side = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        ord_struct.alias("ord"),
        F.lit(None).cast(dict(e.dtypes)["event_id"]).alias("event_id"),
        F.lit(None).cast(dict(e.dtypes)["ts"]).alias("ts"),
    )
    ev_side = e.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast(ord_side.schema["ord"].dataType).alias("ord"),
        "event_id",
        "ts",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy(
            F.col("t").asc(),
            F.col("is_order").desc(),
            F.col("ord.o_orderkey").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ord_side.unionByName(ev_side)
        .withColumn("last_ord", F.last("ord", ignorenulls=True).over(w))
        .filter(F.col("is_order") == 0)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            "ts",
            F.col("last_ord.o_orderkey").alias("last_order_id"),
            F.col("last_ord.o_orderdate").cast("date").alias("last_order_date"),
            _dec(F.col("last_ord.o_totalprice")).cast("double").alias(
                "last_order_price"
            ),
        )
    )


Q23_SQL = """
SELECT event_id, user_id, ts, last_order_id, last_order_date, last_order_price
FROM (
  SELECT e.event_id, e.user_id, e.ts,
    o.o_orderkey AS last_order_id,
    CAST(o.o_orderdate AS DATE) AS last_order_date,
    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS last_order_price,
    ROW_NUMBER() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def q24_monetary_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe percentile binning: percent_rank deciles over
    per-customer spend — the 100 TB replacement for the reference's
    global ntile (W5 hazard, SURVEY §4 scale notes;
    ``customer_segmentation.py:45-60``).

    percent_rank is (rank-1)/(n-1): identical closed form in both
    engines, and the unique customer_id tiebreak makes rank (and so
    the decile) fully deterministic.
    """
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("monetary")
    )
    w = Window.orderBy(F.col("monetary").asc(), F.col("customer_id").asc())
    pr = F.percent_rank().over(w)
    decile = (F.least(F.floor(pr * 10), F.lit(9)) + 1).cast("int")
    return per_cust.select(
        "customer_id",
        "monetary",
        pr.alias("pct_rank"),
        decile.alias("monetary_decile"),
    )


Q24_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS customer_id,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY 1
)
SELECT customer_id, monetary,
  PERCENT_RANK() OVER (ORDER BY monetary ASC, customer_id ASC) AS pct_rank,
  CAST(LEAST(FLOOR(PERCENT_RANK() OVER (ORDER BY monetary ASC, customer_id ASC) * 10), 9) + 1 AS INT)
    AS monetary_decile
FROM per_cust
"""


def q25_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table monitoring rows via UNION ALL (O3; reference
    freshness/row-count packs ``sql_queries_and_dashboards.py:224-253``,
    ``sql_alerts_monitoring.py:27-51``)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e = load(spark, sf_dir, "events")

    def stats(df: DataFrame, name: str, ts_col: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("row_count"),
            F.min(F.col(ts_col).cast("date")).alias("min_date"),
            F.max(F.col(ts_col).cast("date")).alias("max_date"),
        )

    return (
        stats(o, "orders", "o_orderdate")
        .unionAll(stats(li, "lineitem", "l_shipdate"))
        .unionAll(stats(e, "events", "ts"))
    )


Q25_SQL = """
SELECT 'orders' AS table_name, COUNT(*) AS row_count,
       MIN(CAST(o_orderdate AS DATE)) AS min_date, MAX(CAST(o_orderdate AS DATE)) AS max_date
FROM orders
UNION ALL
SELECT 'lineitem', COUNT(*), MIN(CAST(l_shipdate AS DATE)), MAX(CAST(l_shipdate AS DATE))
FROM lineitem
UNION ALL
SELECT 'events', COUNT(*), MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))
FROM events
"""


QUALITY_RULES: list[tuple[str, str]] = [
    ("custkey_not_null", "o_custkey IS NOT NULL"),
    ("positive_amount", "o_totalprice > 0"),
    ("valid_status", "o_orderstatus IN ('O', 'F', 'P')"),
    ("date_in_range", "o_orderdate <= TIMESTAMP '2002-01-01'"),
]


def q26_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-rule metrics in ONE pass: per-rule pass/fail counts via
    conditional sums, unpivoted to rule rows (A11 single-pass rewrite of
    the reference's driver loop of count()s,
    ``src/quality/expectations.py:162-212`` — SURVEY §4 scale note).
    """
    o = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_total")] + [
        F.sum(F.when(F.expr(cond), 1).otherwise(0)).alias(f"pass_{i}")
        for i, (_, cond) in enumerate(QUALITY_RULES)
    ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', pass_{i}" for i, (name, _) in enumerate(QUALITY_RULES)
    )
    return one.selectExpr(
        "n_total", f"stack({len(QUALITY_RULES)}, {stack_args}) AS (rule, n_pass)"
    ).select(
        "rule",
        "n_total",
        "n_pass",
        (F.col("n_total") - F.col("n_pass")).alias("n_fail"),
        (F.col("n_pass").cast("double") / F.col("n_total").cast("double")).alias(
            "pass_rate"
        ),
    )


Q26_SQL = f"""
WITH m AS (
  SELECT COUNT(*) AS n_total,
    {", ".join(f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS pass_{i}" for i, (_, cond) in enumerate(QUALITY_RULES))}
  FROM orders
)
{" UNION ALL ".join(
    f"SELECT '{name}' AS rule, n_total, pass_{i} AS n_pass, n_total - pass_{i} AS n_fail, "
    f"CAST(pass_{i} AS DOUBLE) / CAST(n_total AS DOUBLE) AS pass_rate FROM m"
    for i, (name, _) in enumerate(QUALITY_RULES)
)}
"""


def q39_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — correlated
    scalar-subquery semantics (O5; reference scalar subqueries
    ``sql_queries_and_dashboards.py:239-253``), expressed Spark-side as
    a partitioned window (one shuffle, no per-row subquery execution).
    The per-nation average uses exact decimal sums so both engines
    compute the identical double.
    """
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    nation_avg = (
        F.sum(_dec("c_acctbal")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    acct = _dec("c_acctbal").cast("double")
    return (
        c.select(
            F.col("c_custkey").alias("customer_id"),
            "c_nationkey",
            acct.alias("acctbal"),
            nation_avg.alias("nation_avg"),
        )
        .filter(F.col("acctbal") > F.col("nation_avg"))
    )


Q39_SQL = """
SELECT * FROM (
  SELECT c.c_custkey AS customer_id, c.c_nationkey,
    CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
    (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
     FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg
  FROM customer c
) WHERE acctbal > nation_avg
"""


SEQ_CAP = 20


def q40_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event sequence, capped at SEQ_CAP items (A4
    ``collect_list(struct(...))`` with the SURVEY §4 size cap;
    reference ``transform_clickstream.py:106-108``). Serialized as a
    '|'-joined string so the cross-engine value hash is
    representation-stable.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.withColumn("_rn", F.row_number().over(w))
    seq = F.concat_ws(
        "|",
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_rn") <= SEQ_CAP,
                        F.struct(F.col("_rn"), F.col("event_type")),
                    )
                )
            ),
            lambda s: s["event_type"],
        ),
    )
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        seq.alias("event_seq"),
    )


Q40_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
  COALESCE(STRING_AGG(CASE WHEN rn <= {SEQ_CAP} THEN event_type END, '|' ORDER BY rn), '')
    AS event_seq
FROM ranked GROUP BY user_id
"""


RELATIONAL_QUERIES = {
    "q16_customer_clean": (q16_customer_clean, Q16_SQL),
    "q17_order_priority_exists": (q17_order_priority_exists, Q17_SQL),
    "q18_shipping_priority": (q18_shipping_priority, Q18_SQL),
    "q19_brand_top_parts": (q19_brand_top_parts, Q19_SQL),
    "q20_revenue_rollup": (q20_revenue_rollup, Q20_SQL),
    "q21_event_pivot": (q21_event_pivot, Q21_SQL),
    "q23_asof_join": (q23_asof_join, Q23_SQL),
    "q24_monetary_deciles": (q24_monetary_deciles, Q24_SQL),
    "q25_table_stats": (q25_table_stats, Q25_SQL),
    "q26_quality_metrics": (q26_quality_metrics, Q26_SQL),
    "q39_above_nation_avg": (q39_above_nation_avg, Q39_SQL),
    "q40_event_sequences": (q40_event_sequences, Q40_SQL),
}
