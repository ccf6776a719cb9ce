"""Pipeline assembly — the driver programs that replace the Airflow DAGs."""

from pasta_pipeline_spark.plans.pipeline import PastaPipeline, ingest_raw_messages

__all__ = ["PastaPipeline", "ingest_raw_messages"]
