"""Named queries + DuckDB oracles over the driver testdata.

Each entry exercises one operator family from SURVEY.md §2 against the
TPC-H-ish tables (FIXTURES.md §B mapping). Conventions that make the
driver's order-insensitive value-hash comparison deterministic:

- **Fixed-point bridge for float aggregates.** Double summation order
  is nondeterministic in both engines, and double→decimal casts round
  differently (Spark converts via exact BigDecimal + HALF_UP; DuckDB
  scales in double arithmetic), so any SUM over doubles goes through
  ``FLOOR(x * 10000)`` → int64: per-row double multiply is
  IEEE-identical in Spark and DuckDB, FLOOR is unambiguous, and int64
  addition is exact and order-free — both engines produce bit-identical
  sums, surfaced as ``sum/10000.0`` DOUBLE. Averages divide the exact
  sum by the count.
- **Epoch-second integers for windows.** Timestamp rendering and
  session timezones differ across engines; window starts are returned
  as BIGINT epoch seconds.
- **Deterministic LIMIT.** Every LIMIT carries a total ORDER BY with a
  unique tiebreak column.
- **NOT IN only over provably non-null keys** (J1 null-semantics note,
  SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP
from pasta_pipeline_spark.schemas import load_table


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: the Spark implementation and (when
    SQL-expressible) the equivalent DuckDB oracle."""

    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def wrap(fn):
        # registration is append-only (the driver's correctness window
        # keys on position): a duplicate name would silently SHADOW an
        # earlier query's implementation and oracle — fail loud instead
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog query name: {name!r}")
        REGISTRY[name] = QuerySpec(spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _tp(spark, sf_dir, name):
    """Like _t, but guarantees session-level parallelism: the per-row
    compute-heavy queries (HOF/regex expression chains over documents)
    would otherwise run as wide as the parquet row-group count — one
    task for the single-row-group local test files. No-op when the
    input already has enough partitions (the real-scale case)."""
    from pasta_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(load_table(spark, sf_dir, name))


#: Fixed-point sum scale — see module docstring.
_XS = 10000


def _xsum(expr):
    """Cross-engine-exact SUM of a double expression (fixed-point
    bridge). SQL twin: ``SUM(CAST(FLOOR(x * 10000) AS BIGINT)) / 10000.0``."""
    return F.sum(F.floor(expr * F.lit(_XS)).cast("long")) / F.lit(float(_XS))


