"""Multimodal (image/audio/video) column operators (north-star family).

Design: media are opaque ``binary`` columns with typed metadata structs —
the reference's uploaded-file blobs (/root/reference/backend/ingestion.py:70-74,
served at /root/reference/backend/main.py:589-600) become first-class
DataFrame columns via the ``binaryFile`` source. Every transform is an
Arrow-batched ``mapInPandas`` stage: the binary payload crosses to Python
once per batch, the decoded representation never materializes JVM-side,
and partitioning carries over (no shuffle for per-row media ops).

The decode kernels themselves (PIL/libsndfile/ffmpeg) are NOT in this
container: each kernel is import-gated, with a clearly-marked
deterministic fake (`fake_decode=True`) so the Spark plumbing — schema,
batch shape, UDF signatures, partition behavior — is real and tested.
Swapping in the real library changes only the kernel body.

Scale notes: media rows are large (MBs) — `spark.sql.files.maxPartitionBytes`
and `maxRecordsPerFile` size partitions; feature extraction is
CPU-bound, so the stage parallelizes by rows with zero skew unless file
sizes skew (mitigate with size-bucketed repartitioning).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def _sniff_format(content: bytes) -> str:
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        return "webp"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def _decode_image_dims(content: bytes, fake: bool) -> tuple[int, int]:
    """Width/height. Real path uses PIL (import-gated); fake path parses
    PNG IHDR directly or derives deterministic dims from a content hash."""
    fmt = _sniff_format(content)
    if not fake:
        try:
            from PIL import Image  # type: ignore
            import io

            with Image.open(io.BytesIO(content)) as im:
                return im.width, im.height
        except ImportError as e:
            raise NotImplementedError("PIL not installed; use fake_decode") from e
    if fmt == "png" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return int(w), int(h)
    # deterministic fake: dims derived from content hash
    d = hashlib.md5(content).digest()
    return 64 + d[0] % 64, 64 + d[1] % 64


def image_metadata(files: DataFrame, fake_decode: bool = True) -> DataFrame:
    """S7-analog metadata extraction (width/height/format —
    /root/reference/backend/extractors/image_extractor.py:48-55) over a
    binaryFile DataFrame, one mapInPandas stage."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                content = row.content
                try:
                    w, h = _decode_image_dims(content, fake_decode)
                    err = None
                except Exception as e:
                    w = h = 0
                    err = str(e)
                recs.append(
                    {
                        "path": row.path,
                        "n_bytes": len(content),
                        "format": _sniff_format(content),
                        "width": w,
                        "height": h,
                        "error": err,
                    }
                )
            yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(run, schema=IMAGE_META_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def image_features(files: DataFrame, dim: int = 64, fake_decode: bool = True) -> DataFrame:
    """Feature extraction: binary → fixed-dim float vector, the input to
    embedding-space dedup/search for media. Real path = a vision model
    per executor (same cache pattern as pipeline/embed.py); fake path =
    deterministic content-hash projection (unit-norm), preserving the
    pipeline contract (dim, normalization, dtype)."""
    import numpy as np
    import pandas as pd

    if not fake_decode:  # pragma: no cover
        raise NotImplementedError(
            "vision feature extractors not installed; fake_decode=True "
            "provides the deterministic stand-in"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats, paths = [], []
            for row in pdf.itertuples(index=False):
                seed = int.from_bytes(
                    hashlib.md5(row.content).digest()[:4], "big"
                )
                rng = np.random.RandomState(seed)
                v = rng.standard_normal(dim)
                v /= np.linalg.norm(v)
                feats.append(v.astype(np.float32))
                paths.append(row.path)
            yield pd.DataFrame({"path": paths, "feature": feats})

    return files.select("path", "content").mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(files: DataFrame, every_n: int = 10, fake_decode: bool = True) -> DataFrame:
    """Frame sampling (video → frame rows): the UDTF shape again (one
    media row → N frame rows). Fake path slices the payload into
    deterministic pseudo-frames; real path would wrap pyav/ffmpeg."""
    import pandas as pd

    if not fake_decode:  # pragma: no cover
        raise NotImplementedError("ffmpeg/pyav not installed; use fake_decode")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                content = row.content
                n_frames = max(1, len(content) // 1024)
                for i in range(0, n_frames, every_n):
                    lo = i * 1024
                    recs.append(
                        {
                            "path": row.path,
                            "frame_index": i,
                            "frame": content[lo : lo + 1024],
                        }
                    )
            yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def wav_bytes(
    sample_rate: int, n_channels: int, bits: int, n_frames: int
) -> bytes:
    """Construct a minimal valid PCM WAV (RIFF/fmt/data) — the test
    fixture generator whose parameters ARE the expected metadata."""
    block_align = n_channels * bits // 8
    data_size = n_frames * block_align
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    data = struct.pack("<4sI", b"data", data_size) + b"\x00" * data_size
    riff_size = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data


def parse_wav_header(content: bytes) -> dict:
    """REAL WAV metadata parse — RIFF chunk walk, no external library
    (unlike image/ffmpeg kernels, PCM WAV headers are pure struct math;
    the reference's audio story is OCR-adjacent and absent, so this is
    the one media decoder this container can run for real). Raises
    ValueError on malformed input."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt_info, data_size = 12, None, None
    while pos + 8 <= len(content):
        cid, csize = struct.unpack("<4sI", content[pos : pos + 8])
        body = content[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, n_ch, rate, _br, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt_info = (n_ch, rate, block_align, bits)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt_info is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, block_align, bits = fmt_info
    n_frames = data_size // block_align if block_align else 0
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "duration_ms": round(n_frames * 1000 / rate) if rate else 0,
    }


def audio_metadata(files: DataFrame) -> DataFrame:
    """Audio-column metadata (channels/rate/bits/duration) over a
    binaryFile DataFrame — the S7-for-audio analog, one Arrow-batched
    mapInPandas stage; malformed rows yield error rows, never task
    failures (a 100 TB media scan must not die on one corrupt blob)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                rec = {
                    "path": row.path,
                    "n_bytes": len(content),
                    "format": _sniff_format(content),
                    "n_channels": 0,
                    "sample_rate": 0,
                    "bits_per_sample": 0,
                    "duration_ms": 0,
                    "error": None,
                }
                try:
                    rec.update(parse_wav_header(content))
                except Exception as e:  # noqa: BLE001 — error rows
                    rec["error"] = str(e)
                recs.append(rec)
            yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )


BMP_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def bmp_bytes(pixels) -> bytes:
    """Construct a 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER) from a row-major [[(r,g,b), ...], ...] grid — the
    test-fixture generator whose pixel values ARE the expected channel
    means. Rows are stored bottom-up with 4-byte padding, per the spec."""
    height = len(pixels)
    width = len(pixels[0])
    row_pad = (-(width * 3)) % 4
    body = b""
    for row in reversed(pixels):  # BMP scanlines are bottom-up
        for r, g, b in row:
            body += struct.pack("<BBB", b, g, r)  # stored as BGR
        body += b"\x00" * row_pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    return file_header + info + body


def parse_bmp_pixels(content: bytes) -> dict:
    """REAL BMP pixel decode — pure struct + numpy, no external library
    (24-bit uncompressed BITMAPINFOHEADER, the lingua-franca subset; the
    PNG path stays import-gated because inflate needs a codec, but BMP
    pixel data is raw bytes — this is the image analog of the WAV RIFF
    decoder). Returns dims + per-channel means; raises ValueError on
    anything malformed or unsupported (compressed, non-24-bit)."""
    import numpy as np

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    flipped = height > 0  # positive height = bottom-up storage
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    need = offset + stride * height
    if len(content) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * height, offset=offset)
    rows = raw.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if flipped:
        rows = rows[::-1]
    means = rows.astype(np.float64).mean(axis=(0, 1))  # BGR order on disk
    return {
        "width": int(width),
        "height": int(height),
        "mean_r": float(round(means[2], 6)),
        "mean_g": float(round(means[1], 6)),
        "mean_b": float(round(means[0], 6)),
    }


def image_pixel_stats(files: DataFrame) -> DataFrame:
    """Per-image pixel statistics (dims + channel means) over a
    binaryFile DataFrame via the REAL BMP decoder — one Arrow-batched
    mapInPandas stage; malformed/unsupported rows become error rows,
    never task failures. The Spark-side plumbing (schema, batching,
    error-row discipline) is identical to what a PIL/ffmpeg kernel
    would use at 100 TB — only the codec call differs."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                rec = {
                    "path": row.path,
                    "n_bytes": len(content),
                    "width": 0,
                    "height": 0,
                    "mean_r": 0.0,
                    "mean_g": 0.0,
                    "mean_b": 0.0,
                    "error": None,
                }
                try:
                    rec.update(parse_bmp_pixels(content))
                except Exception as e:  # noqa: BLE001 — error rows
                    rec["error"] = str(e)
                recs.append(rec)
            yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(
        run, schema=BMP_PIXEL_SCHEMA
    )
