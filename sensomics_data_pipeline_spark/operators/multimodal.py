"""Multimodal column plumbing (north-star ops): images/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The image/audio decode libraries are not in this container, so the
*decode* step is stubbed (deterministic fake or ``NotImplementedError``)
— but the Spark-side plumbing is real and tested: schemas, batch
shapes, UDF signatures, partitioning. Swapping the stub for Pillow /
torchaudio is a one-function change.

Scale notes: binary payloads ride in Arrow buffers (no base64, no
per-row pickling); ``spark.sql.files.maxPartitionBytes`` and
``maxRecordsPerBatch`` bound executor memory per batch; metadata-only
stages (``with_media_metadata``) never touch payload bytes beyond
length, so Catalyst prunes the binary column away when downstream only
reads metadata.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass: byte length, crc32-style portable hash, magic
    prefix — pure column expressions, payload column prunable."""
    p = F.col(payload_col)
    return (
        df.withColumn("n_bytes", F.length(p))
        .withColumn("payload_md5", F.md5(p))
        .withColumn("magic", F.hex(F.substring(p, 1, 4)))
    )


def decode_image(payload: bytes) -> "object":
    """Stub decode: the real implementation would be Pillow/libjpeg.
    Deterministic fake: derives a pseudo 'pixel' array shape from the
    payload hash so downstream shape plumbing is testable."""
    raise NotImplementedError(
        "image decode requires Pillow (not in this container); "
        "use fake_decode_features for pipeline testing"
    )


def fake_decode_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake feature extractor standing in for a decoder+
    CNN featurizer: n_features floats in [0,1) derived from md5(payload).
    Stable across engines/runs — lets the full pipeline (decode →
    features → similarity) run end-to-end without media libs."""
    h = hashlib.md5(payload or b"").digest()
    out = []
    for i in range(n_features):
        chunk = h[(2 * i) % 16] * 256 + h[(2 * i + 1) % 16]
        out.append(round(chunk / 65536.0, 6))
    return out


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    n_features: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the shape
    of a real decode+featurize stage (mapInPandas, one numpy batch per
    Arrow chunk), with the stub featurizer inside."""
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(
        fields + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                fake_decode_features(p, n_features) for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 16,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling for 'video' payloads: treat the payload as a
    sequence of fixed-size frames, emit every ``stride``-th frame as its
    own row (frame_no, frame bytes, frame hash). Real frame decoding
    would replace the byte-slice; the explode shape, schema and
    partition behavior are the production ones."""
    fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
            T.StructField("frame_md5", T.StringType(), True),
        ]
    )
    keep_cols = [f.name for f in fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col] or b""
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fno in range(0, n_frames, stride):
                    frame = bytes(payload[fno * frame_bytes : (fno + 1) * frame_bytes])
                    rows.append(
                        tuple(row[c] for c in keep_cols)
                        + (fno, frame, hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=keep_cols + ["frame_no", "frame", "frame_md5"])

    return df.mapInPandas(run, out_schema)


def resize_stub(
    df: DataFrame, payload_col: str = "payload", target: tuple[int, int] = (64, 64)
) -> DataFrame:
    """Resize stand-in: real impl decodes + resamples; the stub
    deterministically re-compresses the payload (zlib) so output bytes
    change shape-appropriately and are reproducible."""
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(
        fields + [T.StructField("resized", T.BinaryType(), True)]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = [
                zlib.compress(p or b"", level=1)[: target[0] * target[1]]
                for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)
