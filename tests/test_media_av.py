"""Audio (WAV/PCM) and video (YUV4MPEG2) decode operators:

- codec round-trips are exact (encode -> decode recovers samples/frames),
- honest NotImplementedError on codecs the stdlib cannot decode,
- the two driver queries match their closed-form DuckDB oracles at test
  scale (the same compare the driver runs), and
- features are validated on a NON-fixture signal (a sine) against a direct
  numpy computation, so the operator is correct beyond the fixture's
  closed-form family.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from kgforge.operators.media_av import (
    audio_features,
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    video_frame_sample,
)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    sr, out = decode_wav(encode_wav(s, 16000))
    assert sr == 16000
    assert np.array_equal(out, s)


def test_y4m_roundtrip_exact():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, size=(6, 9), dtype=np.uint8) for _ in range(5)]
    w, h, out = decode_y4m(encode_y4m(frames, 9, 6))
    assert (w, h) == (9, 6)
    assert len(out) == 5 and all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_undecodable_codecs_raise():
    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x04mp3-like-bytes" + b"\x00" * 64)
    # stereo PCM: honest refusal rather than wrong channel deinterleave
    import struct

    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00\x18ftypisom-mp4-like" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):  # subsampled colorspace
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\nFRAME\n" + b"\x00" * 24)


def test_audio_features_match_numpy_on_sine(spark):
    """Non-fixture signal: 440 Hz sine at 8 kHz — RMS/peak/ZCR recomputed
    directly from the same samples with numpy."""
    t = np.arange(4000)
    s = (3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    df = spark.createDataFrame([(0, bytearray(encode_wav(s, 8000)))], "media_id long, payload binary")
    row = audio_features(df).collect()[0]
    x = s.astype(np.int64)
    assert row["sample_rate"] == 8000 and row["n_samples"] == 4000
    assert row["duration_ms"] == 500
    assert row["peak"] == int(np.abs(x).max())
    assert row["rms"] == round(float(np.sqrt(np.mean(x * x))), 6)
    assert row["zero_crossings"] == int(np.sum(x[:-1] * x[1:] < 0))


def test_video_sampling_stride(spark):
    """every_k=3 over 7 frames keeps indices 0,3,6; means are the frame means."""
    frames = [np.full((4, 5), 10 * f + 3, dtype=np.uint8) for f in range(7)]
    df = spark.createDataFrame(
        [(9, bytearray(encode_y4m(frames, 5, 4)))], "media_id long, payload binary"
    )
    rows = video_frame_sample(df, every_k=3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    assert all(r["n_frames"] == 7 and (r["width"], r["height"]) == (5, 4) for r in rows)
    assert [r["mean_y"] for r in rows] == [3.0, 33.0, 63.0]


def _oracle_compare(spark, key):
    import __spark_entry__ as e

    sdf = e.queries()[key](spark, "/root/testdata/sf0.001").toPandas()
    odf = duckdb.connect().execute(e.oracle_sql()[key]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o) and len(s) > 10
    for c in cols:
        assert (s[c].astype(str).values == o[c].astype(str).values).all(), c


def test_q_audio_features_matches_oracle(spark):
    _oracle_compare(spark, "q_audio_features")


def test_q_video_frames_matches_oracle(spark):
    _oracle_compare(spark, "q_video_frames")
