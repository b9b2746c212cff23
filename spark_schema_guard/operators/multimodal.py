"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with a typed metadata
struct.  The Spark-side machinery — schema, batching, partition sizing,
mapInPandas signatures — is real and tested; the codec step itself is
stubbed (this container has no image/audio libraries) behind
``decoder=`` hooks: the default deterministic fake derives features from
the bytes so pipelines are testable end-to-end, and a real decoder
(PIL/torchaudio/ffmpeg) drops in without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),   # image/audio/video
    T.StructField("format", T.StringType()),       # png/jpeg/wav/mp4...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("size_bytes", T.LongType()),
])

FEATURE_DIM = 16

FEATURES_TYPE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("error", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode+featurize: a unit-normalized
    vector from the sha256 of the bytes.  Replace with a real codec via
    the ``decoder`` parameter."""
    digest = hashlib.sha256(payload).digest()
    raw = [b / 255.0 - 0.5 for b in digest[:FEATURE_DIM]]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [x / norm for x in raw]


def unavailable_decode(payload: bytes) -> list[float]:
    """The honest stub: raises until a media codec is installed."""
    raise NotImplementedError(
        "media codecs are not available in this environment; plug a real "
        "decoder into extract_features(decoder=...)")


def pillow_decode(payload: bytes) -> list[float]:
    """Real image decode when Pillow is importable (it is not baked into
    this container — the deterministic fake stays the default): decode,
    resize to 4x4 grayscale, return the 16 pixel intensities unit-
    normalized.  Import is lazy and per-executor; raises the same
    NotImplementedError as :func:`unavailable_decode` when Pillow is
    absent so pipelines fail loudly, never silently wrong."""
    try:
        import io

        from PIL import Image  # public library, optional
    except ImportError as exc:
        raise NotImplementedError(
            "pillow_decode requires the Pillow package; install it or "
            "use the default fake_decode") from exc
    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    raw = [p / 255.0 - 0.5 for p in img.getdata()]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [x / norm for x in raw]


def attach_media_metadata(df: DataFrame, binary_col: str,
                          media_type: str = "image") -> DataFrame:
    """Typed metadata struct for an opaque binary column.  Width/height/
    duration stay NULL until a real probe decoder is plugged in; size and
    format sniffing (magic bytes) are real."""
    payload = F.col(binary_col)
    magic = F.hex(F.substring(payload, 1, 4))
    fmt = (
        F.when(magic.startswith("89504E47"), F.lit("png"))
        .when(magic.startswith("FFD8"), F.lit("jpeg"))
        .when(magic.startswith("52494646"), F.lit("riff"))
        .otherwise(F.lit("unknown"))
    )
    meta = F.when(payload.isNotNull(), F.struct(
        F.lit(media_type).alias("media_type"),
        fmt.alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(payload).cast("long").alias("size_bytes"),
    ))
    return df.withColumn(f"{binary_col}_meta", meta)


def extract_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    decoder: Callable[[bytes], list[float]] = fake_decode,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode/featurize binary payloads with ``mapInPandas`` — Arrow
    batches in, feature rows out; per-row failures are captured as
    (ok=false, error) rows instead of failing the task.

    ``batch_rows`` bounds Arrow batch memory for fat payloads (set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly for real
    media; images of ~1MB want batches of ~64)."""
    id_name, bin_name = id_col, binary_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, oks, errors, feats = [], [], [], []
            for row_id, payload in zip(batch[id_name], batch[bin_name]):
                ids.append(row_id)
                if payload is None:
                    oks.append(False); errors.append("null payload"); feats.append(None)
                    continue
                try:
                    feats.append(decoder(bytes(payload)))
                    oks.append(True); errors.append(None)
                except NotImplementedError:
                    raise
                except Exception as exc:  # corrupt media must not kill the task
                    oks.append(False); errors.append(str(exc)[:200]); feats.append(None)
            yield pd.DataFrame({"id": ids, "ok": oks, "error": errors,
                                "features": feats})

    narrowed = df.select(id_col, binary_col)
    return narrowed.mapInPandas(run, FEATURES_TYPE)


def sample_frames(df: DataFrame, id_col: str, binary_col: str, *,
                  every_n_bytes: int = 1 << 16, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing for video-ish payloads: splits the byte
    stream at fixed offsets (stand-in for keyframe extraction) — one row
    per (id, frame_index, frame_bytes).  Real keyframe logic replaces the
    offset arithmetic only."""
    payload = F.col(binary_col)
    n_frames = F.least(
        F.greatest((F.length(payload) / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames))
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.alias("frame_index"),
            F.substring(payload, i * every_n_bytes + 1, every_n_bytes)
            .alias("frame_bytes")))
    return (
        df.where(payload.isNotNull())
        .select(F.col(id_col), F.explode(frames).alias("f"))
        .select(id_col, "f.frame_index", "f.frame_bytes")
    )
