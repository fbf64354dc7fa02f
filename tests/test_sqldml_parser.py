"""Pure-parser unit tests for tables/sqldml.py — no SparkSession.
The scanner must respect quotes/parens when splitting, requalify
aliases without corrupting string literals, and classify statements
regardless of case/comments.
"""

from __future__ import annotations

import pytest

from databricks_delta_lake_project_spark.tables.sqldml import (
    _find_top,
    _parse_assignments,
    _requalify,
    _split_commas,
    _split_top,
    _strip_comments,
    statement_kind,
)


def test_statement_kind_cases_and_comments():
    assert statement_kind("MERGE INTO t USING s ON 1=1") == "merge"
    assert statement_kind("  merge\nINTO t ...") == "merge"
    assert statement_kind("-- a comment\nUPDATE t SET a=1") == "update"
    assert statement_kind("DELETE FROM t") == "delete"
    assert statement_kind("insert into t values (1)") == "insert"
    assert statement_kind("ALTER TABLE t DROP COLUMN c") == "alter"
    assert statement_kind("OPTIMIZE t ZORDER BY (a)") == "optimize"
    assert statement_kind("VACUUM t") == "vacuum"
    assert statement_kind("RESTORE TABLE t TO VERSION AS OF 1") == "restore"
    assert statement_kind("SELECT * FROM t") is None
    assert statement_kind("WITH x AS (SELECT 1) SELECT * FROM x") is None


def test_strip_comments_preserves_quoted_dashes():
    sql = "SELECT '--not a comment' AS x -- real comment\nFROM t"
    out = _strip_comments(sql)
    assert "'--not a comment'" in out
    assert "real comment" not in out


def test_split_commas_respects_nesting_and_quotes():
    parts = _split_commas("a = f(x, y), b = 'p,q', c = (1, 2)")
    assert parts == ["a = f(x, y)", "b = 'p,q'", "c = (1, 2)"]


def test_find_top_skips_parens_and_strings():
    sql = "x = 'WHERE' AND (y WHERE 1) AND z WHERE q"
    m = _find_top(sql, r"\bWHERE\b")
    # the only depth-0 unquoted WHERE is the last one
    assert sql[m.start():].startswith("WHERE q")


def test_split_top_when_clauses():
    sql = (
        "ON a = b WHEN MATCHED AND x = 'WHEN' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    parts = _split_top(sql, r"\bWHEN\b")
    assert len(parts) == 3  # head + two clauses
    assert parts[1].strip().startswith("WHEN MATCHED")
    assert parts[2].strip().startswith("WHEN NOT MATCHED")


def test_parse_assignments_case_expression_rhs():
    out = _parse_assignments(
        "a = CASE WHEN x = 1 THEN 'a=b' ELSE c END, b = t.v + 1"
    )
    assert out == {
        "a": "CASE WHEN x = 1 THEN 'a=b' ELSE c END",
        "b": "t.v + 1",
    }


def test_requalify_basic_and_dotted():
    out = _requalify(
        "target.id = source.id AND cat.sch.tbl.x > 0",
        "cat.sch.tbl",
        "target",
        None,
        "source",
    )
    assert out == "t.id = s.id AND t.x > 0"


def test_requalify_swapped_canonical_aliases():
    # user used t for SOURCE and s for TARGET — two-phase placeholders
    # must not cross-contaminate
    out = _requalify("s.id = t.id AND s.v > t.v", None, "s", None, "t")
    assert out == "t.id = s.id AND t.v > s.v"


def test_requalify_leaves_string_literals_alone():
    out = _requalify(
        "target.name = 'target.name' AND source.x = 1",
        "tbl",
        "target",
        None,
        "source",
    )
    assert out == "t.name = 'target.name' AND s.x = 1"


def test_requalify_word_boundary_no_partial_match():
    # `retarget.` must not be rewritten just because it ends in `target.`
    out = _requalify("retarget.id = source.id", None, "target", None, "source")
    assert out == "retarget.id = s.id"


def test_strip_comments_backslash_escape_and_blocks():
    """Spark-lexer semantics: \\' inside a literal does not close the
    quote (so a -- inside it is data, not a comment); nested block
    comments strip; '' doubling still survives."""
    from databricks_delta_lake_project_spark.tables.sqldml import (
        _strip_comments,
    )

    s = "UPDATE t SET note = 'don\\'t -- keep' WHERE id = 1"
    assert _strip_comments(s) == s
    assert (
        _strip_comments("/* a /* nested */ b */ DELETE FROM t").strip()
        == "DELETE FROM t"
    )
    s2 = "SELECT 'it''s -- fine' AS v -- tail"
    assert _strip_comments(s2) == "SELECT 'it''s -- fine' AS v "


def test_strip_comments_preserves_optimizer_hints():
    """/*+ ... */ is a HINT, not commentary: Spark's lexer keeps it
    and join planning depends on it — stripping must too."""
    from databricks_delta_lake_project_spark.tables.sqldml import (
        _strip_comments,
    )

    s = "SELECT /*+ BROADCAST(d) */ * FROM f JOIN d ON f.k = d.k"
    assert _strip_comments(s) == s
    # plain comments around a hint still strip
    assert (
        _strip_comments("/* note */ SELECT /*+ REPARTITION(4) */ 1")
        == "  SELECT /*+ REPARTITION(4) */ 1"
    )


def test_identifier_tokens_fail_closed_both_lexer_modes():
    """A '\\' literal flips where the string ends depending on
    spark.sql.parser.escapedStringLiterals — the security token scan
    unions both interpretations so neither mode can hide a table."""
    from databricks_delta_lake_project_spark.tables.sqldml import (
        identifier_tokens,
    )

    # default lexer: '\\' is one literal backslash; legacy lexer: the
    # literal closes at the second quote. restricted_t must surface
    # under BOTH readings of each statement.
    assert "restricted_t" in identifier_tokens(
        "SELECT '\\\\', c FROM restricted_t"
    )
    assert "restricted_t" in identifier_tokens(
        "SELECT '\\', c FROM restricted_t"
    )
