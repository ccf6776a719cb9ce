"""Catalog registry package — split from the former 13k-line
queries/catalog.py monolith (r8 verdict ask #4); see _core.py for
the cross-engine determinism conventions.

TIER IMPORT ORDER BELOW IS THE REGISTRATION ORDER — the driver's
correctness window keys on position, so the list is append-only:
add new tiers at the END, new queries at the end of the last tier.
"""

from pasta_pipeline_spark.queries.catalog._core import (  # noqa: F401
    QuerySpec,
    REGISTRY,
    register,
    spark_queries,
    oracle_queries,
    _t,
    _tp,
    _xsum,
)

from pasta_pipeline_spark.queries.catalog import t01_core_relational  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t02_text_analysis  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t03_dedup_ladder  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t04_similarity_ann  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t05_multimodal  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t06_sampling_sessions  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t07_subdoc_robust  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t08_relational_depth2  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t09_tpch_round2_hygiene  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t10_summaries_ids  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t11_tpch_round3a  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t12_tpch_round3b  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t13_tpch_round3c  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t14_tpch_round3d  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t15_dsir  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t16_round7  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t17_wave8  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t18_wave9  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t19_wave10  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t20_waves11_22  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t21_wave23  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t22_wave28  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t23_wave30  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t24_wave32  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t25_wave33  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t26_wave34  # noqa: E402,F401
from pasta_pipeline_spark.queries.catalog import t27_wave35  # noqa: E402,F401
