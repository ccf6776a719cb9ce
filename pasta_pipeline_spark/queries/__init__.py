"""Query catalog — every operator from SURVEY.md §2 exposed as a named
query with (where SQL-expressible) a DuckDB oracle.

``REGISTRY`` maps name -> QuerySpec(spark_fn, oracle_sql). The driver
contract (__spark_entry__.py) is generated from this registry.
"""

from pasta_pipeline_spark.queries.catalog import REGISTRY, QuerySpec, spark_queries, oracle_queries

__all__ = ["REGISTRY", "QuerySpec", "spark_queries", "oracle_queries"]
