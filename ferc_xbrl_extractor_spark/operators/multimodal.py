"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media lives in the engine as opaque ``binary`` columns plus a typed
metadata struct — the layout that keeps Parquet scans prunable (metadata
reads never touch the blob pages) and lets Spark shuffle/partition media
rows like any other row.

Codec layering (the ``pipeline/sinks.py`` frictionless pattern), in
dispatch order inside the same Arrow-batched ``mapInPandas`` bodies:

1. **PPM (P6)** — a REAL pure-numpy codec, always available: binary
   netpbm is uncompressed (header + raw RGB), so decode, ITU-R 601-2
   luma, nearest-neighbor resize, and re-encode are numpy array ops with
   no image library at all. ``decode_stub=False`` genuinely decodes in
   any environment for this format.
2. **Pillow** — layered in for every other format when importable.
3. Neither applies → ``decode_stub=False`` raises NotImplementedError at
   the batch level; ``decode_stub=True`` produces deterministic fake
   features derived from the bytes.

The Spark-side plumbing — schema, Arrow batch shapes, ``mapInPandas``
signatures, partition sizing — is identical on every path, so the plan
never depends on which kernel ran.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # image codec for non-PPM formats, layered in when available
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - sandbox has no Pillow
    _PILImage = None


def decode_ppm(b: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (h, w, 3) uint8 array — pure
    numpy. Supports the netpbm grammar: '#' comments and arbitrary
    whitespace between header tokens; maxval must fit one byte."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        c = b[i : i + 1]
        if c == b"#":
            i = b.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while not b[j : j + 1].isspace():
                j += 1
            tokens.append(int(b[i:j]))
            i = j
    w, h, maxval = tokens
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace byte after maxval, per spec
    pix = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _nn_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (center sampling) —
    deterministic, no interpolation library."""
    h, w = arr.shape[:2]
    rows = np.minimum(
        ((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1
    )
    cols = np.minimum(
        ((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1
    )
    return arr[rows][:, cols]


def _luma(arr: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 integer luma (the PIL 'L' formula): (299R + 587G +
    114B) // 1000 per pixel, uint8."""
    a = arr.astype(np.int64)
    return (
        (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000
    ).astype(np.uint8)

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

    def _real_feature(b: bytes) -> list[float] | None:
        # real kernel: decode, ITU-R 601-2 grayscale, downsample to
        # `dim` pixels, map intensities to [-1, 1) — deterministic for a
        # given image. NULL/empty content yields a NULL feature (the
        # stub fabricates one from bytes; a real decoder has nothing to
        # decode). PPM decodes via the pure-numpy codec everywhere;
        # other formats fall through to Pillow when importable.
        if not b:
            return None
        if b[:2] == b"P6":
            row = _nn_resize(_luma(decode_ppm(b)), dim, 1)[0]
            return [float(p) / 128.0 - 1.0 for p in row]
        if _PILImage is None:
            raise NotImplementedError(
                "only the built-in PPM (P6) codec is available in this "
                "environment (Pillow not importable); re-encode media as "
                "PPM, run with decode_stub=True, or install Pillow"
            )
        import io

        img = _PILImage.open(io.BytesIO(b)).convert("L").resize((dim, 1))
        return [p / 128.0 - 1.0 for p in img.getdata()]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kernel = _fake_feature if decode_stub else (
                lambda b, _d=dim: _real_feature(b)
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
    by the resized encoding. With ``decode_stub=False``, PPM (P6) content
    resizes for real via the pure-numpy codec (nearest-neighbor,
    re-encoded as PPM) in any environment; other formats use Pillow when
    importable (re-encoded as PNG). The stub path keeps deterministic
    truncated/md5-padded bytes sized ~proportionally to the pixel count,
    so the plumbing — blob-through-Arrow round trip, struct metadata
    rewrite, output schema stability — is testable with no codec at all.
    """

    def real_resize(b):
        # NULL/undecodable-empty content passes through as NULL — parity
        # with how a real pipeline quarantines rather than crashes on
        # blob-less rows (the stub fabricates bytes instead).
        if b is None or len(b) == 0:
            return None
        b = bytes(b)
        if b[:2] == b"P6":
            return encode_ppm(_nn_resize(decode_ppm(b), width, height))
        if _PILImage is None:
            raise NotImplementedError(
                "only the built-in PPM (P6) codec is available in this "
                "environment (Pillow not importable); re-encode media as "
                "PPM, run with decode_stub=True, or install Pillow"
            )
        import io

        img = _PILImage.open(io.BytesIO(b)).resize((width, height))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def _out_mime(b, declared):
        if decode_stub:
            # the stub never decodes: the declared mime is kept
            return declared
        if b is not None and bytes(b[:2]) == b"P6":
            return "image/x-portable-pixmap"
        return "image/png"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:

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
                    # real kernels re-encode (PPM stays PPM, PIL emits
                    # PNG); the stub keeps the declared mime (it never
                    # decodes)
                    "mime": [
                        _out_mime(b, m["mime"])
                        for b, m in zip(pdf["content"], pdf["meta"])
                    ],
                    "width": width,
                    "height": height,
                    "duration_ms": pdf["meta"].apply(lambda m: m["duration_ms"]),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].apply(
                        fake_resize if decode_stub else real_resize
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
