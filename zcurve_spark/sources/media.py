"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators.  Codec status: **audio decode
is REAL** (stdlib RIFF/WAV parse + numpy DSP features), **image decode
and resize are REAL for uncompressed 24-bit BMP** (struct+numpy
container parse; nearest-neighbor resample); compressed image formats
and video decode are STUBBED behind a deterministic fake (no
PIL/cv2/av in this container) — the Spark-side contract (schemas,
batch iteration, partitioning, null handling) is identical either way,
so a production deployment swaps codecs without touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media_blobs(spans: DataFrame) -> DataFrame:
    """Attach a deterministic fake payload + metadata to media spans.

    blob = repeated md5 stream seeded by media_ref (pure Column ops);
    metadata derived from the ref hash.  Stand-in for reading object
    storage by media_ref at production scale.
    """
    media = spans.filter(F.col("kind") == "media")
    seed = F.md5(F.col("media_ref"))
    blob = F.to_binary(F.concat(seed, F.md5(F.concat(seed, F.lit("1"))), F.md5(F.concat(seed, F.lit("2")))), F.lit("hex"))
    h = F.abs(F.xxhash64("media_ref"))
    meta = F.struct(
        F.when(h % 3 == 0, F.lit("image")).when(h % 3 == 1, F.lit("audio")).otherwise(F.lit("video")).alias("media_type"),
        ((h % 1920) + 1).cast("int").alias("width"),
        ((h % 1080) + 1).cast("int").alias("height"),
        ((h % 60000) + 1).cast("int").alias("duration_ms"),
    )
    return media.withColumn("blob", blob).withColumn("meta", meta)


def _fake_decode(blob: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: FEATURE_DIM floats from a
    hash stream of the payload.  Replace with a real decoder in prod.

    NOTE: a real implementation would raise NotImplementedError here if
    the codec library is unavailable; the fake keeps tests hermetic.
    """
    d = hashlib.sha256(blob + media_type.encode()).digest()
    arr = np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (arr.astype(np.float64) / 2**32).astype(np.float32)


# --- real audio codec path (stdlib WAV; image/video stay stubbed -----------
# because no PIL/cv2/av exist in this container) -----------------------------


def synth_wav_blob(seed: int, *, sample_rate: int = 8000, n_samples: int = 2048) -> bytes:
    """A REAL mono 16-bit PCM WAV payload (RIFF container via the stdlib
    `wave` writer): a deterministic mix of two sines + hash noise.  Used
    to exercise the real decode path end to end."""
    import io
    import wave

    rng = np.arange(n_samples, dtype=np.float64)
    f1 = 110.0 + (seed % 19) * 37.0
    f2 = 523.25 + (seed % 7) * 91.0
    noise_seed = np.frombuffer(
        hashlib.sha256(str(seed).encode()).digest() * ((n_samples * 8) // 32 + 1),
        dtype=np.uint64,
    )[:n_samples]
    noise = (noise_seed.astype(np.float64) / 2**64 - 0.5) * 0.1
    sig = 0.5 * np.sin(2 * np.pi * f1 * rng / sample_rate) + 0.3 * np.sin(
        2 * np.pi * f2 * rng / sample_rate
    ) + noise
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> np.ndarray:
    """REAL audio decode: parse the RIFF/WAV container (stdlib `wave`),
    then numpy DSP features — FEATURE_DIM floats:
    [n_channels, sample_rate/48k, seconds, rms, zero-crossing rate,
     peak, 10 log-energy FFT bands].  Raises on non-WAV bytes (callers
    fall back per media_type)."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch, sw, sr, nframes = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        raw = w.readframes(nframes)
    if sw != 2:
        raise ValueError(f"unsupported sample width {sw}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    n = max(len(x), 1)
    rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, FEATURE_DIM - 6)
    band_e = [float(np.log1p(np.sum(b**2))) for b in bands]
    out = np.array(
        [float(nch), sr / 48000.0, n / max(sr, 1), rms, zcr, peak, *band_e],
        dtype=np.float32,
    )
    return out[:FEATURE_DIM]


# --- real image codec path (24-bit BI_RGB BMP via struct+numpy; ------------
# compressed formats (PNG/JPEG) stay stubbed — no codec libs here) ----------


def _bmp_encode(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> a REAL 24-bit uncompressed BMP file
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR scanlines,
    rows padded to 4 bytes)."""
    import struct

    h, w, _ = pix.shape
    row = w * 3
    stride = (row + 3) & ~3
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = pix[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    return header + info + rows.tobytes()


def synth_bmp_blob(seed: int, *, width: int = 32, height: int = 24) -> bytes:
    """A REAL BMP payload: RG gradient + hash-noise blue channel, fully
    deterministic per seed.  Exercises the real image decode path."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    r = ((xx * 255) // max(width - 1, 1)).astype(np.uint8)
    g = ((yy * 255) // max(height - 1, 1)).astype(np.uint8)
    need = width * height
    noise = np.frombuffer(
        hashlib.sha256(str(seed).encode()).digest() * (need // 32 + 1),
        dtype=np.uint8,
    )[:need].reshape(height, width)
    return _bmp_encode(np.stack([r, g, noise], axis=-1))


def _bmp_pixels(blob: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP -> (h, w, 3) uint8 RGB.
    Handles bottom-up and top-down scanline order and row padding;
    raises on anything that isn't plain BI_RGB 24bpp."""
    import struct

    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", blob, 10)[0]
    hsz, w, h_raw, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if hsz < 40 or bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
        raise ValueError(f"unsupported BMP (hsz={hsz} bpp={bpp} comp={comp})")
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=off)
    bgr = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    pix = bgr[:, :, ::-1]
    return pix if h_raw < 0 else pix[::-1]


def decode_bmp(blob: bytes) -> np.ndarray:
    """REAL image decode: BMP container parse + numpy features —
    FEATURE_DIM floats: [w/4096, h/4096, mean R/G/B, gray std,
    horizontal edge energy, 9-bin gray histogram fractions]."""
    pix = _bmp_pixels(blob).astype(np.float64)
    h, w = pix.shape[:2]
    gray = pix @ np.array([0.299, 0.587, 0.114])
    edge = float(np.mean(np.abs(np.diff(gray, axis=1)))) / 255.0 if w > 1 else 0.0
    hist = np.histogram(gray, bins=FEATURE_DIM - 7, range=(0.0, 255.0001))[0]
    hist = hist / max(gray.size, 1)
    out = np.array(
        [
            w / 4096.0,
            h / 4096.0,
            float(pix[:, :, 0].mean()) / 255.0,
            float(pix[:, :, 1].mean()) / 255.0,
            float(pix[:, :, 2].mean()) / 255.0,
            float(gray.std()) / 255.0,
            edge,
            *hist.tolist(),
        ],
        dtype=np.float32,
    )
    return out[:FEATURE_DIM]


def resize_bmp(blob: bytes, width: int, height: int) -> bytes:
    """REAL image resize: nearest-neighbor resample in numpy, re-encoded
    as BMP.  The per-payload codec shape a production resize UDF has."""
    pix = _bmp_pixels(blob)
    h, w = pix.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return _bmp_encode(pix[yi][:, xi])


def codec_decode(blob: bytes, media_type: str) -> np.ndarray:
    """Production-shaped dispatch: REAL WAV parsing for audio payloads,
    REAL BMP parsing for image payloads; deterministic fake for video
    and for compressed image formats (no PIL/cv2/av in this container —
    swap those branches for real codecs in deployment)."""
    if media_type == "audio":
        try:
            return decode_wav(blob)
        except Exception:
            return _fake_decode(blob, media_type)
    if media_type == "image":
        try:
            return decode_bmp(blob)
        except Exception:
            return _fake_decode(blob, media_type)
    return _fake_decode(blob, media_type)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas image resize over (media_ref, blob): decodable BMP
    payloads are resampled to (width, height); undecodable payloads pass
    through with their original bytes (a real pipeline would route them
    to a transcode queue).  Arrow-batched; per-payload codec calls."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, ws, hs = [], [], []
            for b in pdf["blob"]:
                try:
                    nb = resize_bmp(bytes(b), width, height)
                    blobs.append(nb); ws.append(width); hs.append(height)
                except Exception:
                    blobs.append(None if b is None else bytes(b))
                    ws.append(-1); hs.append(-1)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "blob": blobs,
                }
            )

    return media.select("media_ref", "blob").mapInPandas(op, RESIZED_SCHEMA)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = _fake_decode,
) -> DataFrame:
    """mapInPandas feature extraction over (media_ref, blob, meta).

    Batches stream through Arrow; the loop below is per-*batch* with a
    per-row codec call — exactly the shape a real decoder needs (codecs
    are inherently per-payload; the win is batched transfer + pipelined
    partitions, not vectorized decode).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if b is None else decode_fn(bytes(b), mt)
                for b, mt in zip(pdf["blob"], pdf["meta"].map(lambda m: m["media_type"]))
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                    "n_bytes": pdf["blob"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "features": feats,
                }
            )

    return media.select("media_ref", "blob", "meta").mapInPandas(op, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed — timestamps only, plus a frame key)."""
    v = media.filter(F.col("meta.media_type") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    return v.select(
        "media_ref",
        F.posexplode(ts).alias("frame_idx", "ts_ms"),
    ).withColumn("frame_key", F.concat(F.col("media_ref"), F.lit("#"), F.col("ts_ms")))
