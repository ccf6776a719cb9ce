"""Multimodal column plumbing (SURVEY.md §7 M6).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested;
the actual codec work is stubbed because the container ships no
image/audio libraries:

- ``decode="stub"``  → deterministic fake features derived from the
  bytes themselves (length, md5, pseudo-dimensions) so the pipeline is
  end-to-end testable and oracle-checkable;
- ``decode="real"``  → raises NotImplementedError at the first batch,
  by design, until a codec dependency (Pillow/ffmpeg/...) is wired in.

Everything runs through ``mapInPandas``: one Arrow round-trip per
partition, batch-columnar on both sides, no per-row Python overhead
beyond the loop inside the batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def _stub_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode': features computable from raw bytes.
    width/height are derived from the md5 so they look plausible and
    stay reproducible."""
    out = {"media_id": [], "media_type": [], "n_bytes": [], "content_md5": [], "width": [], "height": []}
    for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
        out["media_id"].append(mid)
        out["media_type"].append(mtype)
        if payload is None:
            out["n_bytes"].append(0)
            out["content_md5"].append("")
            out["width"].append(None)
            out["height"].append(None)
            continue
        raw = bytes(payload)
        digest = hashlib.md5(raw).hexdigest()
        out["n_bytes"].append(len(raw))
        out["content_md5"].append(digest)
        out["width"].append(int(digest[:4], 16) % 1920 + 1)
        out["height"].append(int(digest[4:8], 16) % 1080 + 1)
    return pd.DataFrame(out)


def extract_media_features(
    df: DataFrame,
    decode: str = "stub",
    id_col: str = "media_id",
    type_col: str = "media_type",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode/feature-extract stage over a media table.

    Input needs (media_id, media_type, payload) columns; output is
    MEDIA_FEATURES_SCHEMA. Partition-parallel via mapInPandas.
    """
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")

    from pasta_pipeline_spark.operators.util import ensure_package_on_workers, ensure_parallelism

    ensure_package_on_workers(df.sparkSession)
    src = ensure_parallelism(
        df.select(
            F.col(id_col).alias("media_id"),
            F.col(type_col).alias("media_type"),
            F.col(payload_col).alias("payload"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires a codec library (Pillow/ffmpeg); "
                    "this container ships none — use decode='stub'"
                )
            yield _stub_decode_batch(pdf)

    return src.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def frame_sample_stub(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plumbing: explode each media row into one
    row per sampled frame timestamp (real decode stubbed; the frame
    payload is a deterministic md5 of (bytes, ts)). Demonstrates the
    1→N mapInPandas shape a real sampler uses."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(duration_col).alias("duration_ms"),
    )
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ts_ms", IntegerType(), False),
            StructField("frame_md5", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_ts_ms": [], "frame_md5": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None:
                    continue
                raw = bytes(payload)
                for ts in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame_md5"].append(
                        hashlib.md5(raw + ts.to_bytes(8, "little")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema)


#: Aspect-bucket ladder: (label, upper bound on 100*w/h, exclusive).
#: Integer thresholds are the midpoint-ish cuts between the canonical
#: training ratios 1:2, 3:4, 1:1, 4:3, 2:1.
ASPECT_LADDER = (
    ("tall_1_2", 62),
    ("portrait_3_4", 87),
    ("square_1_1", 116),
    ("landscape_4_3", 166),
    ("wide_2_1", None),
)


def aspect_bucket(width_col, height_col):
    """Aspect-ratio bucket label from integer dimensions — the batch-
    grouping key image-training pipelines use so one batch shares a
    resize target. Contract is pure integer arithmetic:
    ``ap = (100 * width) div height`` compared against fixed ladder
    cuts — no float ratios, so the assignment is engine-exact.
    """
    from pyspark.sql import functions as F

    ap = F.expr(f"(100 * {width_col}) div {height_col}")
    expr = None
    branches = []
    for label, cut in ASPECT_LADDER:
        if cut is not None:
            branches.append((ap < cut, label))
    expr = F.when(branches[0][0], branches[0][1])
    for cond, label in branches[1:]:
        expr = expr.when(cond, label)
    return expr.otherwise(ASPECT_LADDER[-1][0])


def aspect_bucket_sql(width_col: str, height_col: str) -> str:
    """Generated SQL twin of :func:`aspect_bucket` (same ladder, same
    integer arithmetic — cannot drift)."""
    ap = f"((100 * {width_col}) // {height_col})"
    cases = " ".join(
        f"WHEN {ap} < {cut} THEN '{label}'"
        for label, cut in ASPECT_LADDER
        if cut is not None
    )
    return f"CASE {cases} ELSE '{ASPECT_LADDER[-1][0]}' END"


def chunk_manifest(
    df: DataFrame,
    id_col: str = "media_id",
    length_col: str = "duration_ms",
    chunk: int = 30_000,
    overlap: int = 1_000,
) -> DataFrame:
    """Fixed-length chunk manifest over media lengths — the planning
    table an audio/video pipeline feeds its decode workers (30 s ASR
    windows with 1 s overlap, byte-range splits for large blobs; the
    unit is whatever ``length_col`` is in).

    Output one row per chunk: ``(id, chunk_idx, start, end, is_last)``
    with ``start = idx * (chunk - overlap)`` and ``end`` clamped to
    the media length; consecutive chunks overlap by ``overlap``. The
    chunk count is exact integer arithmetic —
    ``1 + ceil((len - chunk) / step)`` via ``(a + step - 1) div step``
    — so the manifest is engine-exact and oracle-checkable. Rows with
    NULL or non-positive length produce no chunks (documented).

    Pure expressions (sequence + explode): no UDF, no shuffle — the
    manifest is a projection, and the downstream decode stage (the
    expensive part) partitions on the manifest rows, not the media
    rows, so one long video no longer pins one task.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be smaller than chunk")
    step = chunk - overlap
    length = F.col(length_col).cast("long")
    # integer division: Spark's `/` on longs is double division — use div
    n = F.when(length <= chunk, F.lit(1).cast("long")).otherwise(
        (F.lit(1) + F.expr(f"(CAST({length_col} AS BIGINT) - {chunk} + {step - 1}) div {step}")).cast("long")
    )
    src = df.filter(length.isNotNull() & (length > 0)).select(
        F.col(id_col).alias("id"), length.alias("__len"), n.alias("__n")
    )
    exploded = src.select(
        "id",
        "__len",
        "__n",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(step)
    end = F.least(start + F.lit(chunk), F.col("__len"))
    return exploded.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start"),
        end.cast("long").alias("end"),
        (F.col("chunk_idx") == F.col("__n") - 1).alias("is_last"),
    )


def chunk_manifest_sql(
    table: str,
    id_col: str,
    length_col: str,
    chunk: int = 30_000,
    overlap: int = 1_000,
    where: str = "TRUE",
) -> str:
    """Generated DuckDB twin of :func:`chunk_manifest` (same integer
    arithmetic — cannot drift)."""
    step = chunk - overlap
    return f"""
    WITH src AS (
      SELECT {id_col} AS id, CAST({length_col} AS BIGINT) AS len,
             CASE WHEN CAST({length_col} AS BIGINT) <= {chunk} THEN 1
                  ELSE 1 + (CAST({length_col} AS BIGINT) - {chunk} + {step - 1}) // {step}
             END AS n
      FROM {table}
      WHERE ({where}) AND {length_col} IS NOT NULL AND {length_col} > 0
    )
    , ex AS (
      SELECT id, len, n, unnest(generate_series(0, n - 1)) AS chunk_idx
      FROM src
    )
    SELECT id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {step} AS BIGINT) AS start,
           CAST(least(chunk_idx * {step} + {chunk}, len) AS BIGINT) AS "end",
           (chunk_idx = n - 1) AS is_last
    FROM ex
    """
