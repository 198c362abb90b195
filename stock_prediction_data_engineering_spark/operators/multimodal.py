"""Multimodal columns (north-star extension, BASELINE.json §L8):
image/audio/video as opaque ``binary`` columns with typed metadata
structs, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing is real and tested: schemas, partition
behavior, UDF signatures, batch shapes. Two codec kernels are ALSO
real, implemented without external libraries: binary PGM (netpbm P5)
image decode in pure numpy and PCM WAV audio decode via the stdlib
``wave`` module. Compressed formats (JPEG/PNG, mp3/ogg) need
PIL/OpenCV-class dependencies, which are not in this environment —
they dispatch through the pluggable codec registry
(``register_image_codec``; ``pil_image_codec`` is the ready-made
Pillow adapter) and ``decode_image`` raises NotImplementedError only
when no registered codec claims the payload. ``fake_decode_image``
remains as the deterministic fixture for the synthetic SGMM
container. Registered codecs are snapshotted by value into each
stage's closure, so a driver-side registration reaches every worker.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, format:string>"
)

# synthetic payload: magic || width || height || n_frames || payload bytes
_MAGIC = b"SGMM"
_HDR = ">4sHHH"


def synth_media(media_id: int, kind: str = "image") -> tuple:
    """Deterministic synthetic media row (seeded by id). Image rows
    carry REAL binary PGM payloads (decoded by the pure-numpy P5
    decoder); audio/video rows carry the synthetic SGMM container."""
    w = 16 + (media_id * 7) % 48
    h = 16 + (media_id * 13) % 48
    n_frames = 1 if kind == "image" else 1 + media_id % 8
    rng = np.random.default_rng(media_id)
    pixels = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    if kind == "image":
        content = encode_pgm(pixels)
        fmt = "pgm"
    else:
        content = struct.pack(_HDR, _MAGIC, w, h, n_frames) + pixels.tobytes()
        fmt = "sgmm"
    meta = (w, h, n_frames, 16000 if kind == "audio" else 0, fmt)
    return (media_id, kind, bytearray(content), meta)


def media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """A synthetic media table; in production this is
    spark.read.format('binaryFile') or parquet with a binary column."""
    kinds = ("image", "audio", "video")
    rows = [synth_media(i, kinds[i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# Pluggable codec registry: (sniff, decode) pairs consulted by
# decode_image for payloads the native decoders don't recognize.
# IMPORTANT pickling subtlety: module-level functions ship to Python
# workers BY REFERENCE (the worker re-imports this module, whose
# registry starts empty), so the mapInPandas stages must snapshot the
# registry into their closure BY VALUE — _dispatching_decoder() does
# exactly that, and is what the stages use as their default decoder.
_IMAGE_CODECS: list[tuple] = []


def register_image_codec(sniff, decode) -> None:
    """Plug a compressed-format decoder into :func:`decode_image`.

    ``sniff(content: bytes) -> bool`` claims a payload (typically a
    magic-byte check); ``decode(content: bytes) -> np.ndarray`` returns
    a 2-D grayscale array (the contract the feature/resize stages
    assume). Registered codecs are tried in registration order after
    the native PGM/SGMM decoders."""
    _IMAGE_CODECS.append((sniff, decode))


def pil_image_codec():
    """(sniff, decode) pair backed by PIL, for use with
    :func:`register_image_codec` — importable only where Pillow is
    installed (it is not baked into this harness, hence the hook
    rather than a hard dependency). Decodes JPEG/PNG/WebP/... to the
    grayscale uint8 array the downstream stages expect."""
    import io

    from PIL import Image  # raises ImportError where Pillow is absent

    magics = (b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"RIFF", b"GIF8")

    def sniff(content: bytes) -> bool:
        return any(content[: len(m)] == m for m in magics)

    def decode(content: bytes) -> np.ndarray:
        with Image.open(io.BytesIO(content)) as img:
            return np.asarray(img.convert("L"), dtype=np.uint8)

    return sniff, decode


def _decode_with(codecs: list, content: bytes) -> np.ndarray:
    if content[:2] == b"P5":
        return decode_pgm(content)
    if content[: len(_MAGIC)] == _MAGIC:
        return fake_decode_image(content)
    for sniff, decode in codecs:
        if sniff(bytes(content)):
            return decode(bytes(content))
    raise NotImplementedError(
        "no registered codec for this payload: compressed image formats "
        "(JPEG/PNG) need a decoder plugged in via register_image_codec "
        "(e.g. register_image_codec(*pil_image_codec()) where Pillow is "
        "installed); PGM and SGMM decode natively"
    )


def _dispatching_decoder():
    """Decoder with the CURRENT registry snapshotted by value — the
    form that survives the trip to a Python worker (a bare reference
    to decode_image would re-import this module there and see an
    empty registry). Lambda-free local closure => cloudpickled by
    value, codec list included."""
    codecs = list(_IMAGE_CODECS)

    def dec(content: bytes) -> np.ndarray:
        return _decode_with(codecs, content)

    return dec


def decode_image(content: bytes) -> np.ndarray:
    """Image decode. PGM (P5, the netpbm grayscale format) is decoded
    for real with pure numpy — no codec libraries needed; the
    synthetic SGMM header is handled for fixtures. Compressed formats
    (JPEG/PNG) dispatch through the pluggable codec registry
    (:func:`register_image_codec`; :func:`pil_image_codec` is the
    ready-made Pillow adapter) and raise NotImplementedError when no
    registered codec claims the payload — honest failure where the
    codec library genuinely isn't installed."""
    return _decode_with(_IMAGE_CODECS, content)


def decode_pgm(content: bytes) -> np.ndarray:
    """Real decode of binary PGM (netpbm 'P5'): ASCII header
    (magic, width, height, maxval — '#' comments allowed) followed by
    raw big-endian samples. Pure numpy; returns (h, w) uint8/uint16."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while True:
            while pos < len(content) and content[pos : pos + 1].isspace():
                pos += 1
            if content[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(content) and content[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            break
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        return content[start:pos]

    magic = token()
    if magic != b"P5":
        raise ValueError(f"not a binary PGM: magic={magic!r}")
    w, h, maxval = int(token()), int(token()), int(token())
    pos += 1  # single whitespace byte after maxval, then raster
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    img = np.frombuffer(content, dtype=dtype, count=w * h, offset=pos)
    return img.reshape(h, w).astype(np.uint16 if maxval > 255 else np.uint8)


def encode_pgm(img: np.ndarray, maxval: int = 255) -> bytes:
    """Inverse of :func:`decode_pgm` (test fixture + resize output)."""
    h, w = img.shape
    header = f"P5\n{w} {h}\n{maxval}\n".encode()
    payload = (
        img.astype(">u2") if maxval > 255 else img.astype(np.uint8)
    ).tobytes()
    return header + payload


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Real decode of PCM WAV via stdlib ``wave`` + numpy: returns
    (samples[frames, channels] int16, sample_rate). Covers the
    uncompressed audio every capture pipeline emits; lossy codecs
    (mp3/ogg) would need external libraries."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {width*8}-bit")
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Inverse of :func:`decode_wav` (test fixture)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1] if samples.ndim == 2 else 1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_frames long, duration_s double, "
    "rms double, peak int"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature stage (duration, RMS level, peak) over binary WAV
    payloads via mapInPandas — same dataflow shape as the image stage;
    per-blob decode is the only per-row Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_wav(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "sample_rate": np.fromiter(
                        (r for _s, r in decoded), dtype=np.int32, count=len(decoded)
                    ),
                    "n_frames": np.fromiter(
                        (s.shape[0] for s, _r in decoded),
                        dtype=np.int64,
                        count=len(decoded),
                    ),
                    "duration_s": np.round(
                        np.fromiter(
                            (s.shape[0] / r for s, r in decoded),
                            dtype=np.float64,
                            count=len(decoded),
                        ),
                        4,
                    ),
                    "rms": np.round(
                        np.fromiter(
                            (
                                float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
                                for s, _r in decoded
                            ),
                            dtype=np.float64,
                            count=len(decoded),
                        ),
                        4,
                    ),
                    "peak": np.fromiter(
                        (int(np.abs(s).max()) for s, _r in decoded),
                        dtype=np.int32,
                        count=len(decoded),
                    ),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


def fake_decode_image(content: bytes) -> np.ndarray:
    """Deterministic decode of the synthetic SGMM format."""
    magic, w, h, _ = struct.unpack_from(_HDR, content)
    if magic != _MAGIC:
        raise ValueError("not an SGMM payload")
    return np.frombuffer(content, dtype=np.uint8, offset=struct.calcsize(_HDR))[
        : w * h
    ].reshape(h, w)


FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "mean_intensity double, p95_intensity double"
)


def extract_features(media: DataFrame, decode=None) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage: one Arrow batch
    in, one feature frame out. Linear, partition-parallel; the binary
    column never leaves the executor. Default decoder dispatches
    native PGM/SGMM plus whatever codecs are registered at plan time
    (snapshotted by value into the closure — see _dispatching_decoder
    for the worker-side pickling subtlety)."""
    decode = decode or _dispatching_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the only per-row Python is the per-blob decode itself;
            # every metadata/statistic column is built vectorized
            imgs = [decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": np.fromiter(
                        (i.shape[1] for i in imgs), dtype=np.int32, count=len(imgs)
                    ),
                    "height": np.fromiter(
                        (i.shape[0] for i in imgs), dtype=np.int32, count=len(imgs)
                    ),
                    "mean_intensity": np.round(
                        np.fromiter(
                            (i.mean() for i in imgs), dtype=np.float64, count=len(imgs)
                        ),
                        4,
                    ),
                    "p95_intensity": np.round(
                        np.fromiter(
                            (np.percentile(i, 95) for i in imgs),
                            dtype=np.float64,
                            count=len(imgs),
                        ),
                        4,
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, content binary"


def resize_images(
    media: DataFrame, out_w: int = 8, out_h: int = 8, decode=None
) -> DataFrame:
    """Resize stage (nearest-neighbor): binary-in/binary-out
    mapInPandas shape; output re-encoded as SGMM."""
    decode = decode or _dispatching_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = np.arange(out_h)
        xs = np.arange(out_w)

        def shrink(blob: bytes) -> bytearray:
            # genuinely per-blob: decode + nearest-neighbor downsample
            img = decode(bytes(blob))
            small = img[np.ix_(ys * img.shape[0] // out_h, xs * img.shape[1] // out_w)]
            return bytearray(struct.pack(_HDR, _MAGIC, out_w, out_h, 1) + small.tobytes())

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "out_width": np.full(len(pdf), out_w, dtype=np.int32),
                    "out_height": np.full(len(pdf), out_h, dtype=np.int32),
                    "content": [shrink(c) for c in pdf["content"]],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling stage for video rows: explode n_frames into frame
    indices JVM-side (no Python needed for the index math)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )
