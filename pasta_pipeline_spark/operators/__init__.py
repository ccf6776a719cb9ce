"""DataFrame operators — the engine's relational core.

All operators are pure ``DataFrame -> DataFrame`` transforms: no
side-effects, no driver-side row iteration, no ``collect()`` in any
hot path. Physical strategy (broadcast vs shuffle, codegen, AQE
re-planning) is left to Catalyst; operators only declare intent.
"""

from pasta_pipeline_spark.operators.merge import merge_upsert, upsert_accumulate
from pasta_pipeline_spark.operators.dedup import keep_latest, keep_first, dedup_exact
from pasta_pipeline_spark.operators.antijoin import (
    anti_join,
    semi_join,
    null_out_orphans,
    select_unprocessed_links,
)
from pasta_pipeline_spark.operators.topk import top_k

__all__ = [
    "merge_upsert",
    "upsert_accumulate",
    "keep_latest",
    "keep_first",
    "dedup_exact",
    "anti_join",
    "semi_join",
    "null_out_orphans",
    "select_unprocessed_links",
    "top_k",
]
