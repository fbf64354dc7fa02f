"""Property test: a MERGE expressed as SQL and the SAME clause spec
applied through the MergeBuilder produce identical final tables — the
SQL parser/requalifier round-trips arbitrary alias names, clause
orders, and conditions without changing semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.tables import LakeTable, sqldml

# aliases deliberately include the builder's canonical t/s and
# keyword-ish names
ALIASES = ["t", "s", "target", "source", "tgt", "src_x"]

clause_specs = st.lists(
    st.sampled_from(
        [
            ("matched_update", "s.v > t.v"),
            ("matched_update", None),
            ("matched_delete", "s.v % 3 = 0"),
            ("matched_delete", None),
            ("not_matched_insert", "s.v % 2 = 0"),
            ("not_matched_insert", None),
            ("by_source_delete", "t.v > 60"),
            ("by_source_update", None),
        ]
    ),
    min_size=1,
    max_size=4,
    unique=True,
)


def _apply_builder(t, src, clauses):
    b = t.merge(src, "t.k = s.k")
    for kind, cond in clauses:
        if kind == "matched_update":
            b.whenMatchedUpdate({"v": "s.v + 100"}, cond)
        elif kind == "matched_delete":
            b.whenMatchedDelete(cond)
        elif kind == "not_matched_insert":
            b.whenNotMatchedInsert({"k": "s.k", "v": "s.v"}, cond)
        elif kind == "by_source_delete":
            b.whenNotMatchedBySourceDelete(cond)
        elif kind == "by_source_update":
            b.whenNotMatchedBySourceUpdate({"v": "t.v - 1"}, cond)
    b.execute()


def _to_sql(ta, sa, clauses):
    def rq(cond):
        if not cond:
            return None
        # two-phase so swapped aliases (ta='s', sa='t') don't
        # double-substitute
        return (
            cond.replace("t.", "\x01.")
            .replace("s.", "\x02.")
            .replace("\x01.", f"{ta}.")
            .replace("\x02.", f"{sa}.")
        )

    parts = [
        f"MERGE INTO prop_target AS {ta} USING prop_source AS {sa} "
        f"ON {ta}.k = {sa}.k"
    ]
    for kind, cond in clauses:
        c = f" AND {rq(cond)}" if cond else ""
        if kind == "matched_update":
            parts.append(
                f"WHEN MATCHED{c} THEN UPDATE SET {ta}.v = {sa}.v + 100"
            )
        elif kind == "matched_delete":
            parts.append(f"WHEN MATCHED{c} THEN DELETE")
        elif kind == "not_matched_insert":
            parts.append(
                f"WHEN NOT MATCHED{c} THEN INSERT (k, v) "
                f"VALUES ({sa}.k, {sa}.v)"
            )
        elif kind == "by_source_delete":
            parts.append(f"WHEN NOT MATCHED BY SOURCE{c} THEN DELETE")
        elif kind == "by_source_update":
            parts.append(
                f"WHEN NOT MATCHED BY SOURCE{c} THEN UPDATE SET {ta}.v = {ta}.v - 1"
            )
    return "\n".join(parts)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    clauses=clause_specs,
    ta=st.sampled_from(ALIASES),
    sa=st.sampled_from(ALIASES),
    seed=st.integers(min_value=0, max_value=5),
)
@pytest.mark.slow
def test_sql_merge_equals_builder_merge(spark, tmp_path_factory, clauses, ta, sa, seed):
    if ta == sa:
        sa = "other_side"
    base = tmp_path_factory.mktemp("prop")
    tgt_rows = [(k, (k * 7 + seed) % 100) for k in range(0, 30)]
    src_rows = [(k, (k * 13 + seed) % 100) for k in range(15, 45)]
    df_t = spark.createDataFrame(tgt_rows, "k int, v int")
    df_s = spark.createDataFrame(src_rows, "k int, v int")

    t_sql = LakeTable.create(spark, str(base / "sql"), df=df_t)
    t_api = LakeTable.create(spark, str(base / "api"), df=df_t)
    sqldml.register_table(spark, "prop_target", t_sql)
    df_s.createOrReplaceTempView("prop_source")

    run_statement(spark, _to_sql(ta, sa, clauses))
    _apply_builder(t_api, df_s, clauses)

    got_sql = sorted((r["k"], r["v"]) for r in t_sql.to_df().collect())
    got_api = sorted((r["k"], r["v"]) for r in t_api.to_df().collect())
    assert got_sql == got_api, _to_sql(ta, sa, clauses)


# ---------------------------------------------------------------------------
# lineage scanner total-function property: the pure string scanners
# behind column lineage must never RAISE on any token soup — a
# statement they cannot parse derives nothing, it never breaks the DML
# that ran (the scan happens after a successful execution)
# ---------------------------------------------------------------------------

_SCAN_TOKENS = [
    "SELECT", "FROM", "JOIN", "ON", "USING", "WITH", "AS", "UNION",
    "ALL", "(", ")", ",", ".", "*", "`t`", "'a''b'", '"q"', "a", "b1",
    "_x", "left", "cluster", "window", "pivot", "natural", "lateral",
    "--c\n", "/*x*/", "=", "AND", "BETWEEN", "1.5", "`we ird`", "\\",
    "'", "`", "minus", "except", "values", "recursive",
]


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.sampled_from(_SCAN_TOKENS), min_size=1, max_size=24),
    st.sampled_from([" ", ""]),
)
def test_lineage_scanners_total_on_token_soup(toks, sep):
    from databricks_delta_lake_project_spark.queries import sqlpack

    s = sep.join(toks)
    out = sqlpack._parse_from_sources(s)
    assert out is None or isinstance(out[0], list)
    assert isinstance(sqlpack._cte_names(s), set)
    sqlpack._parse_cte_defs(s)
    sqlpack._split_set_branches(s)
    sqlpack._ctas_out_names(s)
    sqlpack._split_item_alias(s)
    sqlpack._expr_source_cols(s, {"a": "T"}, set(), {"T": {"x": "x"}})
    sqldml._mask(s)


# ---------------------------------------------------------------------------
# r13 parser helpers: statement PARSE paths may refuse loudly, but only
# with parse-shaped errors (ValueError/NotImplementedError) — never a
# low-level Python exception (StopIteration, IndexError, KeyError) that
# callers cannot distinguish from an engine bug. The r13 review caught
# exactly one such escape (_balanced_paren's bare next()); this pins
# the whole class.
# ---------------------------------------------------------------------------

_DDL_TOKENS = [
    "PARTITION", "(", ")", ",", "=", "'d1'", "NULL", "DEFAULT",
    "VALUES", "day", "`we ird`", "1", "''", "'a''b'", "DRY", "RUN",
    "FULL", "WHERE", "CHECK", "CONSTRAINT", ".", "`", "'", "--x\n",
    "/*c*/", "TYPE", "BIGINT", "DECIMAL(10,2)",
]


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.sampled_from(_DDL_TOKENS), min_size=1, max_size=16),
    st.sampled_from([" ", ""]),
)
def test_r13_parse_helpers_raise_only_parse_errors(toks, sep):
    from databricks_delta_lake_project_spark.tables import sqldml

    s = sep.join(toks)
    for fn in (
        lambda: sqldml._balanced_paren("(" + s),
        lambda: sqldml._split_commas(s),
        lambda: sqldml._mask(s),
        lambda: sqldml.statement_kind(s),
        lambda: sqldml.statement_target("INSERT INTO t " + s),
    ):
        try:
            fn()
        except (ValueError, NotImplementedError):
            pass  # parse-shaped refusals are the contract


@given(
    vals=st.lists(
        st.one_of(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FFF
                ),
                max_size=24,
            ),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.booleans(),
            # pre-Gregorian-cutover dates break F.lit itself (hybrid
            # calendar py4j conversion) - a harness limit, not the
            # renderer's; real partition values are Spark-born
            st.dates(
                min_value=__import__("datetime").date(1900, 1, 1)
            ),
            st.datetimes(
                min_value=__import__("datetime").datetime(1900, 1, 1)
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sql_literal_round_trips_through_spark(spark, vals):
    """PROPERTY: the dynamic-overwrite literal renderer round-trips —
    for any collected partition value v, Spark evaluates
    ``lit(v) <=> expr(_sql_literal(v))`` to TRUE (quotes, backslashes,
    newlines, unicode, timestamps with and without fractions). A
    mis-rendered literal would silently target the wrong partition."""
    from pyspark.sql import functions as F

    checks = [
        F.lit(v).eqNullSafe(F.expr(sqldml._sql_literal(v))).alias(f"c{i}")
        for i, v in enumerate(vals)
    ]
    row = spark.range(1).select(*checks).collect()[0]
    for i, v in enumerate(vals):
        assert row[f"c{i}"], f"literal round-trip failed for {v!r}"
