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
