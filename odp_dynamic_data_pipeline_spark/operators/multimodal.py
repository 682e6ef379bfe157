"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Real decode is implemented pure-numpy for the two formats that need no
external library: WAV (RIFF PCM 8/16-bit) and PPM (binary P6).  Formats
beyond those (JPEG/MP3/MP4...) need PIL/librosa/ffmpeg and route through
the same ``_decode_payload`` dispatch -- the Spark-side plumbing (schema,
partitioning, Arrow batch shape, feature columns) is identical for every
codec.

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
    DoubleType,
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


def synth_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Serialize a float array in [-1, 1] as a minimal mono PCM16 WAV --
    the deterministic payload generator for tests and the rows-only decode
    query (real corpora bring their own bytes)."""
    import numpy as np

    x = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0).astype("<i2")
    data = x.tobytes()
    hdr = b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")          # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")          # block align
        + (16).to_bytes(2, "little")         # bits
    )
    return hdr + fmt + b"data" + len(data).to_bytes(4, "little") + data


def synth_ppm(pixels) -> bytes:
    """Serialize an (h, w, 3) uint8 array as binary PPM (P6)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM decode, numpy only: walks the chunk list for fmt+data,
    normalizes 8/16-bit samples to [-1, 1], and reduces to fixed-width
    features (never re-emits the samples)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or channels < 1 or rate < 1:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(np.float64) / 32768.0
    n = len(x) // channels
    x = x[: n * channels]
    return {
        "media_type": "audio",
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": (n * 1000) // rate,
        "rms": float(np.sqrt((x**2).mean())) if n else 0.0,
        "mean_level": float(x.mean()) if n else 0.0,
    }


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Whitespace/comment-tolerant P6 header parse.
    Returns (width, height, maxval, raster_offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval);
    # '#' starts a comment through end-of-line
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in tokens)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return w, h, maxval, pos


def _decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6) decode, numpy only: whitespace/comment-tolerant
    header parse, then an (h, w, 3) uint8 grid reduced to features."""
    import numpy as np

    w, h, maxval, pos = _ppm_header(payload)
    pix = np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
    if len(pix) < w * h * 3:
        raise ValueError("PPM raster truncated")
    x = pix.astype(np.float64).reshape(h, w, 3) / float(maxval)
    return {
        "media_type": "image",
        "width": w,
        "height": h,
        "channels": 3,
        "sample_rate": None,
        "n_samples": w * h,
        "duration_ms": None,
        "rms": float(np.sqrt((x**2).mean())),
        "mean_level": float(x.mean()),
    }


def attach_synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-format payloads: even ids get a mono PCM16 WAV
    (sine, frequency keyed by id), odd ids a gradient PPM image.  Exists so
    the fake=False decode path has self-contained inputs in any
    environment; a production corpus supplies its own payload column and
    skips this stage."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            kinds = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                if i % 2 == 0:
                    freq = 200.0 + (i % 20) * 50.0
                    t = np.arange(400) / 8000.0  # 50 ms @ 8 kHz
                    payloads.append(
                        synth_wav_pcm16(0.5 * np.sin(2 * np.pi * freq * t), 8000)
                    )
                    kinds.append("audio")
                else:
                    w, h = 8, 4
                    grid = (
                        (np.arange(h * w * 3, dtype=np.int64) * (i % 251 + 1)) % 256
                    ).astype(np.uint8).reshape(h, w, 3)
                    payloads.append(synth_ppm(grid))
                    kinds.append("image")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "media_hint": kinds, "payload": payloads}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("media_hint", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return df.select(id_col).mapInPandas(run, schema=schema)


def _decode_payload(payload: bytes, media_type: str) -> dict:
    """Dispatch on magic bytes; ``media_type`` is the metadata hint but the
    payload's own header wins (corpora lie about content types)."""
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise ValueError(
        f"undecodable payload (magic={payload[:4]!r}, hint={media_type}); "
        "only WAV PCM and PPM P6 decode without external libraries"
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


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("mean_level", DoubleType(), True),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", *, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=True`` computes a deterministic checksum feature (byte sum) over
    arbitrary bytes -- the cross-engine-reproducible path the oracle gate
    uses.  ``fake=False`` runs the REAL decoder (WAV PCM / PPM P6, pure
    numpy) and emits ``MEDIA_FEATURES_SCHEMA`` rows: codec metadata plus
    rms / mean-level reductions.  Same mapInPandas plan shape either way;
    only the per-batch Python differs."""

    if not fake:
        def run_real(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rows = []
                for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                    feats = _decode_payload(bytes(payload), "auto")
                    feats["doc_id"] = doc_id
                    rows.append(feats)
                yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA])

        return df.select(id_col, "payload").mapInPandas(
            run_real, schema=MEDIA_FEATURES_SCHEMA
        )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
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


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("mean_level_e6", LongType(), False),
        StructField("resized", BinaryType(), False),
    ]
)


def resize_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    out_w: int = 4,
    out_h: int = 2,
) -> DataFrame:
    """Image resize over PPM P6 payloads: BOX-MEAN downsample to
    (out_w, out_h) -- each output pixel is the integer-floor mean of its
    input box -- re-encoded as PPM so downstream stages keep one payload
    contract.  Input dims must be integer multiples of the output dims
    (corpus resizing picks pyramid levels; arbitrary-ratio resampling is a
    decode-library concern, out of scope without external deps).

    Arrow-batched mapInPandas, numpy reshape-mean per image, no Python
    per-pixel loops; at 100 TB this is a map-only stage whose output is
    (out_w*out_h/[w*h]) the input bytes -- resize EARLY in a media
    pipeline for exactly this reason.  ``mean_level_e6`` is an exact
    integer ((1e6 * pixel_sum) // (255 * n_subpixels)), so results are
    engine- and platform-stable."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                w, h, _maxval, pos = _ppm_header(raw)
                if w % out_w or h % out_h:
                    raise ValueError(
                        f"resize {w}x{h} -> {out_w}x{out_h}: dims must divide evenly"
                    )
                pix = (
                    np.frombuffer(raw[pos : pos + w * h * 3], dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                by, bx = h // out_h, w // out_w
                boxes = pix.reshape(out_h, by, out_w, bx, 3)
                summed = boxes.sum(axis=(1, 3))
                resized = (summed // (by * bx)).astype(np.uint8)
                total = int(resized.sum(dtype=np.int64))
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        out_w,
                        out_h,
                        (1_000_000 * total) // (255 * out_w * out_h * 3),
                        synth_ppm(resized),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_w", "out_h",
                    "mean_level_e6", "resized",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)


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


AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"


def ahash_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    grid_w: int = 4,
    grid_h: int = 2,
) -> DataFrame:
    """Perceptual average-hash (aHash) over PPM P6 payloads: grayscale
    (integer channel mean), box-mean downsample to a (grid_w, grid_h)
    cell grid, threshold every cell against the grid's own integer mean,
    pack the bits row-major into one BIGINT signature.  Equal signatures =
    perceptual duplicates (robust to re-encode/brightness-preserving
    noise); small hamming distances = near-duplicates.

    All-integer arithmetic (// everywhere, no float resampling), so the
    signature is platform- and engine-stable -- which is what lets the
    synthetic-payload query replay the whole decode->hash chain in SQL.
    Arrow-batched mapInPandas, map-only: at 100 TB the signature is
    computed once per image at ingest and dedup becomes a GROUP BY / LSH
    problem on 8-byte keys, never on pixels.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                w, h, _maxval, pos = _ppm_header(raw)
                if w % grid_w or h % grid_h:
                    raise ValueError(
                        f"ahash {w}x{h} -> {grid_w}x{grid_h}: dims must divide evenly"
                    )
                pix = (
                    np.frombuffer(raw[pos : pos + w * h * 3], dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                gray = pix.sum(axis=2) // 3
                by, bx = h // grid_h, w // grid_w
                cells = gray.reshape(grid_h, by, grid_w, bx).sum(axis=(1, 3)) // (by * bx)
                mean_cell = int(cells.sum()) // (grid_w * grid_h)
                bits = (cells > mean_cell).astype(np.int64).reshape(-1)
                sig = int((bits << np.arange(grid_w * grid_h)).sum())
                rows.append((int(doc_id), w, h, sig))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "ahash"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=AHASH_SCHEMA)
