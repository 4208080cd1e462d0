"""Audio/video columns as real binary formats, dependency-free.

Completes the multimodal surface next to ``multimodal.py``'s image path
(reference scope: parser-shacl has no media handling at all — this is the
training-data-pipeline extension the engine adds; see SURVEY.md §0). Both
formats here are REAL public formats chosen because they are fully
parseable from the stdlib (this runtime has no ffmpeg/soundfile/PIL):

- audio: WAV / RIFF PCM, 16-bit signed little-endian mono (the canonical
  uncompressed interchange format; chunk-walk per the RIFF spec)
- video: YUV4MPEG2 ("Y4M"), the plain-header raw-frame format mpv/ffmpeg
  emit with ``-f yuv4mpegpipe`` — ASCII parameter header, then
  ``FRAME\\n`` + raw Y/U/V planes per frame (C444 = full-resolution
  planes)

Unknown codecs (MP3, H.264, ...) raise NotImplementedError honestly —
entropy decoding has no stdlib implementation.

Operators are single mapInPandas passes (Arrow carries the binary in,
scalars out), the same shape as ``image_features``: decode + reduce inside
the batch, never per-row Python at the DataFrame level, no shuffle. Frame
sampling reads every k-th frame — the standard decimation pattern for
video training corpora, where contiguous frames are near-duplicates.

Scale notes: payloads dominate partition bytes; size
``spark.sql.files.maxPartitionBytes`` down for media tables and project
metadata without the payload wherever possible (column pruning keeps the
binary unread). Per-row output is O(1) scalars (audio) or O(frames/k)
rows (video) — both bounded, no blow-up.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("peak", IntegerType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossings", LongType(), True),
    ]
)

VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_y", DoubleType(), True),
    ]
)


# ------------------------------- WAV codec ----------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM s16le mono WAV: RIFF header + 'fmt ' + 'data' chunks."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, byte-rate = sr*block, block align 2, 16-bit
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walk a RIFF/WAVE container; PCM 16-bit mono only."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(b):
        cid, clen = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        chunk = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            if tag != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only PCM s16le mono is decodable here")
        elif cid == b"data":
            data = chunk
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or data is None:
        raise NotImplementedError("missing fmt/data chunk")
    return sample_rate, np.frombuffer(data, dtype="<i2")


# ------------------------------- Y4M codec ----------------------------------


def encode_y4m(luma_frames: list[np.ndarray], width: int, height: int) -> bytes:
    """YUV4MPEG2 C444: header line, then FRAME + raw Y/U/V planes each."""
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C444\n".encode()]
    uv = np.full(width * height, 128, dtype=np.uint8).tobytes()
    for y in luma_frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(y, dtype=np.uint8).reshape(-1).tobytes())
        out.append(uv)  # U plane
        out.append(uv)  # V plane
    return b"".join(out)


def decode_y4m(b: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Parse the parameter header, then iterate FRAME-delimited raw planes.

    Returns (width, height, [luma (h, w) uint8 arrays]). C444 only (full-res
    U/V planes, which this reader skips over); other colorspaces raise."""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 payload")
    width = height = None
    cspace = "C420jpeg"  # spec default when the C tag is absent
    for tok in b[:nl].split()[1:]:
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            width = int(t[1:])
        elif t[0] == "H":
            height = int(t[1:])
        elif t[0] == "C":
            cspace = t
    if width is None or height is None:
        raise NotImplementedError("Y4M header missing W/H")
    if cspace != "C444":
        raise NotImplementedError(f"only C444 supported, got {cspace}")
    plane, pos, frames = width * height, nl + 1, []
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            raise NotImplementedError("malformed FRAME marker")
        y0 = fnl + 1
        if y0 + 3 * plane > len(b):
            raise NotImplementedError("truncated frame planes")
        frames.append(
            np.frombuffer(b[y0 : y0 + plane], dtype=np.uint8).reshape(height, width)
        )
        pos = y0 + 3 * plane
    return width, height, frames


# --------------------------- DataFrame operators ----------------------------


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV -> duration / peak / RMS / zero-crossing count, one
    mapInPandas pass; all reductions vectorized numpy inside the batch."""

    def fn(batches):
        for pdf in batches:
            rows = {k: [] for k in AUDIO_FEATURES_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, s = decode_wav(bytes(payload))
                x = s.astype(np.int64)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(len(s))
                rows["duration_ms"].append(int(round(len(s) * 1000.0 / sr)))
                rows["peak"].append(int(np.abs(x).max()) if len(s) else 0)
                rows["rms"].append(
                    round(float(np.sqrt(np.mean(x * x))), 6) if len(s) else 0.0
                )
                rows["zero_crossings"].append(int(np.sum(x[:-1] * x[1:] < 0)))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA)


def video_frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Decode Y4M -> keep every k-th frame (decimation; adjacent frames are
    near-dups in training corpora) -> per-frame luma mean. One mapInPandas
    pass emitting O(frames/k) rows per video."""

    def fn(batches):
        for pdf in batches:
            rows = {k: [] for k in VIDEO_FRAMES_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = decode_y4m(bytes(payload))
                for idx in range(0, len(frames), every_k):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["n_frames"].append(len(frames))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_y"].append(round(float(frames[idx].mean()), 6))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(fn, schema=VIDEO_FRAMES_SCHEMA)


# ------------------------------ fixture params -------------------------------
# Closed-form functions of media_id so the DuckDB oracle reconstructs the
# DECODED features arithmetically (same pattern as multimodal.media_color):
# audio is a square wave (RMS == amplitude exactly, sign flips every
# half-period), video is solid-luma frames (mean == the luma value).


def audio_params(i: int) -> tuple[int, int, int, int]:
    """(amplitude, half_period, n_samples, sample_rate) for fixture row i.
    n is a multiple of 8 and sr = 8000, so duration_ms is exactly n/8."""
    return 1000 + (i * 7) % 2000, 2 + i % 9, 800 + (i % 13) * 160, 8000


def video_params(i: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for fixture row i."""
    return 8 + (i % 5) * 4, 6 + (i % 4) * 3, 6 + i % 7


def frame_luma(i: int, f: int) -> int:
    """Solid luma of frame f in fixture video i."""
    return (i * 31 + f * 17) % 240 + 8


def fake_audio_payload(i: int) -> tuple[bytes, int]:
    """(WAV bytes, duration_ms): square wave with audio_params(i)."""
    a, h, n, sr = audio_params(i)
    k = np.arange(n)
    samples = np.where((k // h) % 2 == 0, a, -a).astype(np.int16)
    return encode_wav(samples, sr), n * 1000 // sr


def fake_video_payload(i: int) -> tuple[bytes, int, int, int]:
    """(Y4M bytes, width, height, duration_ms at 25 fps)."""
    w, h, nf = video_params(i)
    frames = [np.full((h, w), frame_luma(i, f), dtype=np.uint8) for f in range(nf)]
    return encode_y4m(frames, w, h), w, h, nf * 40
