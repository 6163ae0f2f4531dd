"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, deterministic synthetic
media generation, Arrow-batched ``mapInPandas`` decode/feature/resize/
frame-sample operators with correct batch shapes and partitioning. The
actual codec work is STUBBED (this container ships no image/audio libs):
``decode_media`` computes deterministic fake features derived from the
binary header, and raises ``NotImplementedError`` when a real decode is
demanded (``require_real_codec=True``).

Scale design: media blobs ride in parquet binary columns next to their
metadata, so partition pruning / column projection work on metadata without
touching bytes; decode stages are ``mapInPandas`` with small batch sizes
(``spark.sql.execution.arrow.maxRecordsPerBatch``) to bound executor memory
against multi-MB blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),  # images/video only
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video only
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def generate_synthetic_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic fake media table: blob bytes derived from sha2 of the
    id+seed (repeated to a pseudo-size), header bytes encode fake dims."""
    base = spark.range(0, n, 1, partitions or 8)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
    )
    # Blob: sha2 hex of (id, seed) repeated 1-16x → 64-1024 bytes, binary.
    rep = (F.pmod(F.xxhash64("id", F.lit(seed), F.lit(1)), 16) + 1).cast("int")
    blob = F.encode(F.repeat(F.sha2(F.concat_ws(":", "id", F.lit(seed)), 256), rep), "utf-8")
    df = base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        blob.alias("content"),
    )
    mime = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in _KINDS]),
            F.array(*[F.lit(_MIMES[k]) for k in _KINDS]),
        ),
        F.col("kind"),
    )
    return df.select(
        "media_id",
        "kind",
        "content",
        mime.alias("mime"),
        F.length("content").cast("long").alias("byte_len"),
    )


def decode_media(
    media: DataFrame,
    feature_dim: int = 8,
    require_real_codec: bool = False,
) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched mapInPandas over the
    binary column.

    STUB: real codecs are unavailable in this container. With
    ``require_real_codec=False`` (default), emits deterministic fake
    features (first bytes of the blob, scaled) and header-derived fake
    dims — the full Spark plumbing (schema, batching, null channels per
    kind) is exercised. ``require_real_codec=True`` raises
    NotImplementedError, marking exactly where PIL/ffmpeg would slot in.
    """
    if require_real_codec:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this "
            "environment; integrate PIL/torchaudio/ffmpeg here"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["byte_len"],
                }
            )
            heads = pdf["content"].map(lambda b: bytes(b[:feature_dim]))
            is_visual = pdf["kind"].isin(["image", "video"])
            is_timed = pdf["kind"].isin(["audio", "video"])
            out["width"] = [
                (h[0] % 64 + 1) * 16 if vis else None
                for h, vis in zip(heads, is_visual)
            ]
            out["height"] = [
                (h[1] % 64 + 1) * 16 if vis else None
                for h, vis in zip(heads, is_visual)
            ]
            out["duration_ms"] = [
                int.from_bytes(h[2:4], "big") * 10 if timed else None
                for h, timed in zip(heads, is_timed)
            ]
            out["feature"] = [
                [float(x) / 255.0 for x in h.ljust(feature_dim, b"\0")]
                for h in heads
            ]
            yield out

    return media.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 256, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling plumbing for video rows: emit ≤ max_frames rows per
    video, each carrying a byte-slice "frame" (stand-in for a decoded frame).
    Row-expanding mapInPandas — the batch contract a real sampler needs."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                blob = bytes(r["content"])
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    rows.append(
                        (
                            r["media_id"],
                            i,
                            blob[i * every_n_bytes : (i + 1) * every_n_bytes],
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(_sample, schema=schema)


def media_summary(features: DataFrame) -> DataFrame:
    """Metadata-only rollup (never touches blob bytes): per-kind counts,
    byte totals, mean feature norm."""
    return (
        features.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("byte_len").alias("total_bytes"),
            F.avg(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x)).alias(
                "mean_sq_feature"
            ),
        )
        .orderBy("kind")
    )
