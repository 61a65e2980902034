"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media lives in the engine as opaque ``binary`` columns plus a typed
metadata struct — the layout that keeps Parquet scans prunable (metadata
reads never touch the blob pages) and lets Spark shuffle/partition media
rows like any other row.

Codec layering (the ``pipeline/sinks.py`` frictionless pattern): when
Pillow is importable, ``decode_stub=False`` runs REAL image decode /
resize kernels inside the same Arrow-batched ``mapInPandas`` bodies; when
it is not (this sandbox has no PIL/ffmpeg/soundfile), ``decode_stub=True``
produces deterministic fake features derived from the bytes and
``decode_stub=False`` raises NotImplementedError at the batch level. The
Spark-side plumbing — schema, Arrow batch shapes, ``mapInPandas``
signatures, partition sizing — is identical on both paths, so the plan
never depends on which kernel ran.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image codec, layered in when the environment provides it
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - sandbox has no Pillow
    _PILImage = None

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table_from_binary(
    df: DataFrame, id_col: str, content_col: str, media_type: str, mime: str
) -> DataFrame:
    """Normalize any (id, binary) relation into the engine's media layout."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(content_col).cast("binary").alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a codec+encoder: md5-seeded floats in
    [-1, 1). Stable across runs/executors — good enough to test the
    pipeline's partitioning, batching, and downstream similarity ops."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(content + counter.to_bytes(4, "little")).digest()
        out.extend((b - 128) / 128.0 for b in h)
        counter += 1
    return out[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow-batched —
    the only sane way to move blobs through Python). Output schema is fixed
    (FEATURE_SCHEMA) so the downstream plan never depends on the stub.

    At scale: blobs dominate batch size, so keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` small enough that a
    batch of blobs fits executor memory; the session factory's 10k default
    assumes ~100 KB media — lower it for video.
    """

    def _pil_feature(b: bytes) -> list[float] | None:
        # real kernel: decode, grayscale, downsample to `dim` pixels, map
        # intensities to [-1, 1) — deterministic for a given image.
        # NULL/empty content yields a NULL feature (the stub fabricates
        # one from bytes, a real decoder has nothing to decode).
        import io

        if not b:
            return None
        img = _PILImage.open(io.BytesIO(b)).convert("L").resize((dim, 1))
        return [p / 128.0 - 1.0 for p in img.getdata()]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub and _PILImage is None:
                raise NotImplementedError(
                    "real media codecs are not available in this environment "
                    "(Pillow not importable); run with decode_stub=True or "
                    "install Pillow"
                )
            kernel = _fake_feature if decode_stub else (
                lambda b, _d=dim: _pil_feature(b)
            )
            contents = pdf["content"].apply(lambda b: bytes(b) if b is not None else b"")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": contents.apply(len).astype("int64"),
                    "content_md5": contents.apply(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": contents.apply(lambda b: kernel(b, dim)),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Image resize over ``mapInPandas``: same media layout in and out,
    with ``meta.width/height`` set to the target and ``content`` replaced
    by the resized encoding. The codec is stubbed (deterministic truncated/
    md5-padded bytes sized ~proportionally to the pixel count) so the
    plumbing — blob-through-Arrow round trip, struct metadata rewrite,
    output schema stability — is real and testable without PIL.
    """

    def pil_resize(b):
        # NULL/undecodable-empty content passes through as NULL — parity
        # with how a real pipeline quarantines rather than crashes on
        # blob-less rows (the stub fabricates bytes instead).
        import io

        if b is None or len(b) == 0:
            return None
        img = _PILImage.open(io.BytesIO(bytes(b))).resize((width, height))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not decode_stub and _PILImage is None:
                raise NotImplementedError(
                    "real image codecs are not available in this environment "
                    "(Pillow not importable); run with decode_stub=True or "
                    "install Pillow"
                )

            def fake_resize(b):
                b = bytes(b) if b is not None else b""
                if len(b) >= target:
                    return b[:target]
                pad = b
                while len(pad) < target:
                    pad += hashlib.md5(pad[-16:] or b"seed").digest()
                return pad[:target]

            meta = pd.DataFrame(
                {
                    "media_type": pdf["meta"].apply(lambda m: m["media_type"]),
                    # the real kernel re-encodes to PNG; the stub keeps
                    # the declared mime (it never decodes)
                    "mime": (
                        pdf["meta"].apply(lambda m: m["mime"])
                        if decode_stub
                        else "image/png"
                    ),
                    "width": width,
                    "height": height,
                    "duration_ms": pdf["meta"].apply(lambda m: m["duration_ms"]),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].apply(
                        fake_resize if decode_stub else pil_resize
                    ),
                    "meta": meta.to_dict("records"),
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode per-media sample timestamps
    from metadata (duration), leaving the frame decode itself to the
    stubbed kernel. Emits (media_id, sample_ms) — the join key layout a
    real frame extractor fills in."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
