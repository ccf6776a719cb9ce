"""Sources and sinks — SURVEY.md §2.1.

- ``tables``: parquet-backed mutable tables with atomic overwrite (the
  engine's stand-in for the reference's Postgres tables).
- ``files``: CSV/JSON snapshot sinks + schema'd scans (S3/S4/S5).
- ``fetch``: the rate-limited partition-parallel HTTP fetch stage (S10).
- ``jdbc``: optional JDBC connector kept for parity with S6.
"""

from pasta_pipeline_spark.sources.tables import TableStore
from pasta_pipeline_spark.sources.files import (
    write_csv_snapshot,
    write_json_snapshot,
    read_json_snapshot,
)

__all__ = [
    "TableStore",
    "write_csv_snapshot",
    "write_json_snapshot",
    "read_json_snapshot",
]
