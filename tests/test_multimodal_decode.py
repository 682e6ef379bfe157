"""Real multimodal decode: WAV PCM / PPM P6, pure numpy, via mapInPandas.

Payloads are synthesized with known analytic properties (sine rms =
amp/sqrt(2), constant-image mean = value/maxval) so the decoded features
are value-asserted, not just schema-asserted.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from odp_dynamic_data_pipeline_spark.operators.multimodal import (
    _decode_payload,
    attach_synth_media,
    extract_features,
    synth_ppm,
    synth_wav_pcm16,
)


def test_wav_decode_known_sine():
    rate, ms, amp, freq = 8000, 1000, 0.5, 440.0
    t = np.arange(rate * ms // 1000) / rate
    payload = synth_wav_pcm16(amp * np.sin(2 * np.pi * freq * t), rate)
    f = _decode_payload(payload, "audio")
    assert f["media_type"] == "audio"
    assert f["channels"] == 1 and f["sample_rate"] == rate
    assert f["n_samples"] == 8000 and f["duration_ms"] == 1000
    # full periods of a sine: rms = amp / sqrt(2), mean ~ 0
    assert abs(f["rms"] - amp / math.sqrt(2)) < 1e-3
    assert abs(f["mean_level"]) < 1e-3


def test_wav_decode_dc_signal():
    # constant 0.25 signal: rms == mean == 0.25 exactly (up to int16 quant)
    payload = synth_wav_pcm16(np.full(100, 0.25), 4000)
    f = _decode_payload(payload, "audio")
    assert f["duration_ms"] == 25
    assert abs(f["rms"] - 0.25) < 1e-3 and abs(f["mean_level"] - 0.25) < 1e-3


def test_ppm_decode_known_image():
    grid = np.zeros((4, 8, 3), dtype=np.uint8)
    grid[..., 0] = 255  # pure red: mean = 1/3, rms = sqrt(1/3)
    f = _decode_payload(synth_ppm(grid), "image")
    assert f["media_type"] == "image"
    assert (f["width"], f["height"], f["n_samples"]) == (8, 4, 32)
    assert abs(f["mean_level"] - 1 / 3) < 1e-9
    assert abs(f["rms"] - math.sqrt(1 / 3)) < 1e-9


def test_ppm_decode_comment_header():
    grid = np.full((2, 2, 3), 128, dtype=np.uint8)
    raw = synth_ppm(grid)
    commented = b"P6\n# a comment line\n2 2\n255\n" + raw[raw.index(b"255\n") + 4 :]
    f = _decode_payload(commented, "image")
    assert (f["width"], f["height"]) == (2, 2)
    assert abs(f["mean_level"] - 128 / 255) < 1e-9


def test_undecodable_payload_raises():
    with pytest.raises(ValueError, match="undecodable"):
        _decode_payload(b"\x89PNG\r\n\x1a\n....", "image")


def test_extract_features_real_path(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    feats = extract_features(attach_synth_media(df), fake=False).collect()
    by_id = {r["doc_id"]: r for r in feats}
    assert len(by_id) == 8
    for i in range(8):
        r = by_id[i]
        if i % 2 == 0:
            assert r["media_type"] == "audio"
            assert r["sample_rate"] == 8000 and r["n_samples"] == 400
            # 50 ms sine at amp 0.5; not an integer number of periods for
            # every freq, so allow a loose band around 0.5/sqrt(2)
            assert 0.25 < r["rms"] < 0.45
        else:
            assert r["media_type"] == "image"
            assert (r["width"], r["height"]) == (8, 4)
            assert 0.0 <= r["mean_level"] <= 1.0


def test_binary_file_ingest_to_decode(spark, tmp_path):
    """End-to-end media path: directory of real .wav/.ppm files -> binaryFile
    source -> rename to the payload contract -> real decode -> features."""
    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.sources.readers import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.wav").write_bytes(synth_wav_pcm16(np.full(200, 0.5), 4000))
    (media / "b.ppm").write_bytes(synth_ppm(np.full((2, 3, 3), 255, dtype=np.uint8)))
    (media / "junk.txt").write_text("not media")

    df = read_binary_files(spark, str(media), glob="*.{wav,ppm}")
    assert df.count() == 2  # txt never listed
    payloads = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("content").alias("payload"),
    )
    feats = extract_features(payloads, fake=False)
    by_type = {r["media_type"]: r for r in feats.collect()}
    assert by_type["audio"]["n_samples"] == 200 and by_type["audio"]["sample_rate"] == 4000
    assert abs(by_type["audio"]["rms"] - 0.5) < 1e-3
    assert (by_type["image"]["width"], by_type["image"]["height"]) == (3, 2)
    assert abs(by_type["image"]["mean_level"] - 1.0) < 1e-9


def test_binary_file_ingest_max_bytes(spark, tmp_path):
    from odp_dynamic_data_pipeline_spark.sources.readers import read_binary_files

    media = tmp_path / "sized"
    media.mkdir()
    (media / "small.bin").write_bytes(b"x" * 100)
    (media / "big.bin").write_bytes(b"x" * 10_000)
    df = read_binary_files(spark, str(media), max_bytes=1000)
    assert [r["length"] for r in df.collect()] == [100]


def test_resize_image_box_mean_exact(spark):
    """resize_image must compute exact integer box means, re-encode a valid
    PPM, and be idempotent on dims: verified against an independent numpy
    reference in the test."""
    import numpy as np

    from odp_dynamic_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _ppm_header,
        resize_image,
        synth_ppm,
    )

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=(4, 8, 3), dtype=np.int64)
    df = spark.createDataFrame(
        [(1, bytearray(synth_ppm(pix.astype(np.uint8))))],
        "doc_id long, payload binary",
    )
    out = resize_image(df, out_w=4, out_h=2).collect()[0]
    assert (out["width"], out["height"], out["out_w"], out["out_h"]) == (8, 4, 4, 2)

    # independent reference: mean over each 2x2 box, floor division
    ref = pix.reshape(2, 2, 4, 2, 3).sum(axis=(1, 3)) // 4
    w, h, maxval, pos = _ppm_header(bytes(out["resized"]))
    assert (w, h, maxval) == (4, 2, 255)
    got = np.frombuffer(bytes(out["resized"])[pos:], dtype=np.uint8).reshape(2, 4, 3)
    assert (got == ref).all()
    assert out["mean_level_e6"] == (1_000_000 * int(ref.sum())) // (255 * 4 * 2 * 3)
    # resized payload still decodes through the standard path
    meta = _decode_ppm(bytes(out["resized"]))
    assert (meta["width"], meta["height"]) == (4, 2)


def test_resize_image_rejects_uneven(spark):
    import numpy as np
    import pytest

    from odp_dynamic_data_pipeline_spark.operators.multimodal import (
        resize_image,
        synth_ppm,
    )
    pix = np.zeros((4, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(synth_ppm(pix)))], "doc_id long, payload binary"
    )
    # the ValueError surfaces wrapped in Spark's Python-worker exception
    # chain; match on the message so only the dims-must-divide check passes
    with pytest.raises(Exception, match="dims must divide evenly"):
        resize_image(df, out_w=3, out_h=2).collect()


def test_ahash_identical_payloads_collide_distinct_differ(spark):
    """aHash: same pixels => same signature; different gradients differ
    (for gradient slopes k=1 vs k=101 the cell pattern flips)."""
    import numpy as np

    from odp_dynamic_data_pipeline_spark.operators.multimodal import (
        ahash_image,
        synth_ppm,
    )

    def grad(k):
        p = (np.arange(96, dtype=np.int64) * k) % 256
        return synth_ppm(p.reshape(4, 8, 3).astype(np.uint8))

    rows = [(1, grad(3)), (2, grad(3)), (3, grad(101))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["ahash"] for r in ahash_image(df).collect()}
    assert got[1] == got[2]
    assert 0 <= got[1] < 256
    assert got[1] != got[3]
