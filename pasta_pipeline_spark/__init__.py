"""pasta_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of softK1T/pasta-pipeline (an
Airflow + pandas + Postgres Telegram/Telegraph ETL, read-only snapshot
at /root/reference) as an idiomatic Spark library:

- columnar Parquet tables with explicit StructType schemas
  (``pasta_pipeline_spark.schemas``),
- native-expression scalar functions (``functions/``) — regex link and
  hashtag extraction, MD5 hashing, word counting, URL parsing,
- DataFrame operators (``operators/``) — merge/upsert, window dedup,
  anti-join work selection, statistics, maintenance, plus the
  LLM-data-pipeline extensions (MinHash-LSH / SimHash / n-gram Jaccard
  near-dup detection, embedding similarity search, text analysis,
  multimodal column plumbing),
- sources and sinks (``sources/``) — parquet tables, CSV/JSON
  snapshots, a rate-limited ``mapInPandas`` HTTP fetch stage,
- pipeline assembly (``plans/``) and a Structured Streaming surface
  (``streaming/``).

Design stance: DataFrame API everywhere, Catalyst decides physical
strategy, UDFs only where semantics genuinely require Python (HTML
parse, HTTP fetch, multimodal decode) and then always Arrow-vectorized.
"""

from pasta_pipeline_spark.session import get_spark, DEFAULT_SHUFFLE_PARTITIONS

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

__version__ = "0.1.0"
