"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape) is real;
the actual media decode is stubbed behind ``decode_stub`` because the
image/audio libraries are not in this container -- swap ``_decode_payload``
for a real decoder (PIL/librosa/ffmpeg) in production.

Pattern at scale: binary payloads ride in their own column so column pruning
skips them unless a stage actually decodes; decode runs in ``mapInPandas``
(Arrow-batched, one Python worker per core) and emits fixed-width feature
columns, never re-emitting the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Deterministic fake payload: the utf-8 bytes of a text column stand in
    for real media bytes so the binary-column plumbing is exercised end to
    end (schema: payload binary, meta struct)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _decode_payload(payload: bytes, media_type: str):
    """STUB: real decoders are not available in this container."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg; use fake_features for the "
        "deterministic test path"
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("feat_checksum", LongType(), False),
    ]
)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def frame_sample(
    df: DataFrame, id_col: str = "doc_id", *, chunk_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Video-style frame sampling over binary payloads: emit every Nth
    fixed-size chunk as a 'frame' row (deterministic fake decode -- a real
    pipeline swaps the chunker for ffmpeg keyframe extraction; the Spark
    plumbing is identical: mapInPandas fan-OUT, one input row -> many frame
    rows, payload column pruned after this stage)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_chunks = (len(payload) + chunk_bytes - 1) // chunk_bytes
                for i in range(0, n_chunks, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * chunk_bytes : (i + 1) * chunk_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id", *, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=True`` computes a deterministic checksum feature (byte sum) so the
    mapInPandas batch shape / schema path is fully tested; ``fake=False``
    calls the real decoder stub (raises NotImplementedError here)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                pdf["payload"].map(lambda b: _decode_payload(b, "image"))
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                    # vectorized byte sum (numpy C loop, not Python ints)
                    "feat_checksum": pdf["payload"]
                    .map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64)) % (1 << 31))
                    .astype("int64"),
                }
            )
            yield out

    return df.select(id_col, "payload").mapInPandas(run, schema=DECODED_SCHEMA)


def audio_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    bytes_per_ms: int = 8,
    segment_ms: int = 1000,
    overlap_ms: int = 250,
) -> DataFrame:
    """Audio-style fixed-duration segmentation of binary payloads with
    overlap (the speech-pipeline mirror of text chunking: 1 s windows every
    750 ms at a fake 8 bytes/ms "sample rate").  JVM-side: the byte windows
    come from substring() on the binary column -- NO Python, no explode of
    decoded samples; a real pipeline swaps byte offsets for sample offsets
    after ffmpeg/librosa decode but keeps this exact plan shape.

    Emits (id, seg_idx, seg_start_ms, seg_bytes binary, seg_len int)."""
    step = (segment_ms - overlap_ms) * bytes_per_ms
    width = segment_ms * bytes_per_ms
    seg = F.expr(
        f"transform(sequence(1, greatest(CAST(ceil((length(payload) - {width})"
        f" / CAST({step} AS DOUBLE)) AS INT) + 1, 1)),"
        f" i -> substring(payload, (i - 1) * {step} + 1, {width}))"
    )
    out = df.select(id_col, "payload").withColumn(
        "__segs", seg
    ).select(
        id_col, F.posexplode("__segs").alias("seg_idx", "seg_bytes")
    )
    return out.select(
        id_col,
        "seg_idx",
        (F.col("seg_idx") * (segment_ms - overlap_ms)).cast("long").alias("seg_start_ms"),
        "seg_bytes",
        F.length("seg_bytes").cast("int").alias("seg_len"),
    )
