from .catalog import QUERIES, oracle_sql, queries  # noqa: F401
