"""Pre-join reduction: approximate-membership prefilter for big joins.

At 100 TB the dominant join cost is shuffling fact rows that will NOT
find a match. Spark's own answer is the runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, injected by the
optimizer when a selective build side is detected) — when it fires,
prefer it. This module is the EXPLICIT, plannable form of the same
idea for when the optimizer cannot see the selectivity (a filtered
dimension produced by complex logic, a key set from another pipeline
stage): reduce the probe side BEFORE its shuffle with a conservative
approximate-membership test, then run the real join on the survivors.

The membership structure is a coarse hash-bucket set — bucket id
``pmod(xxhash64(key), m)`` — i.e. a 1-hash bloom filter whose "bit
array" is a DISTINCT bucket-id table of at most ``m`` rows:

- build: one distinct over the build side's buckets (≤ m rows however
  large the build side is — m bounds the broadcast, which a real
  bloom's bit array also needs);
- probe: broadcast LEFT SEMI join on the bucket id — pure JVM
  hashing, no Python, no per-row closure;
- guarantee: NO false negatives (same hash, same modulus), so the
  final join result is EXACT; false positives only cost shuffle bytes
  (expected survivor rate for non-matching keys ≈ |build buckets|/m).

This is the composable primitive behind semi-join reduction in
distributed engines; with k independent salts it generalizes to a
k-hash bloom, but one hash already removes the bulk of a selective
join's dead shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_membership(keys: DataFrame, key_col: str, m: int = 1 << 20) -> DataFrame:
    """Distinct hash-bucket table of the build side's keys: one column
    ``__bucket`` with at most ``m`` rows."""
    return (
        keys.select(F.pmod(F.xxhash64(F.col(key_col)), F.lit(m)).alias("__bucket"))
        .distinct()
    )


def prejoin_filter(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    m: int = 1 << 20,
) -> DataFrame:
    """Rows of ``probe`` whose key COULD match ``build`` (no false
    negatives): broadcast semi-join on the coarse bucket id. Follow
    with the real join — results are exact, the join's shuffle just
    carries fewer dead rows."""
    buckets = bucket_membership(build, build_key, m)
    probed = probe.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(probe_key)), F.lit(m))
    )
    return probed.join(F.broadcast(buckets), "__bucket", "left_semi").drop("__bucket")


def reduced_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    probe_key: str | None = None,
    build_key: str | None = None,
    how: str = "inner",
    m: int = 1 << 20,
) -> DataFrame:
    """The full pattern: prefilter the probe side, then the real join.
    ``on`` is the equi-join key (or list); the prefilter key defaults
    to the (first) join key on both sides."""
    normalized = how.replace("_", "").replace("-", "")
    if normalized not in ("inner", "semi", "leftsemi"):
        # The prefilter DROPS probe rows with no build-side bucket; any
        # join type that must keep unmatched probe rows (left/full
        # outer) or emit only them (anti) would be silently wrong.
        raise ValueError(
            "reduced_join only supports how='inner' or 'left_semi'; "
            f"got {how!r} — the membership prefilter removes unmatched "
            "probe rows, which outer/anti joins must observe"
        )
    keys = [on] if isinstance(on, str) else list(on)
    pk = probe_key or keys[0]
    bk = build_key or keys[0]
    reduced = prejoin_filter(probe, pk, build, bk, m)
    return reduced.join(build, keys, how)
