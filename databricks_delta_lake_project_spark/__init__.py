"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference Customer-360 lakehouse project
(greenwichg/databricks_delta_lake_project).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for unbounded inputs, and an
engine-owned ACID table layer (``tables/``) standing in for the
Databricks-proprietary surfaces the reference relies on.
"""

__version__ = "0.1.0"
