"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

Decode status: **audio decode is REAL** (``decode_audio_wav`` /
``extract_audio_features`` — PCM WAV via the stdlib ``wave`` module,
numpy RMS/peak, no external codec). Image decode remains gated on PIL
(absent in this container): ``fake_decode_features`` derives
deterministic stand-in features from the raw bytes so the image
plumbing — binary schema, metadata struct, Arrow batch shape,
partition-parallel mapInPandas — is still real and tested.

Scale notes: media blobs ride in parquet binary columns;
``mapInPandas`` processes them per Arrow batch
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory), each partition independently — 1000 executors decode 1000
partitions concurrently, and column pruning means metadata-only
queries never read the blob bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, "
    "n_bytes bigint, content_hash string, width int, height int, n_frames int"
)

try:  # decode libs are not in this image — gate behind import-try
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(data: bytes):
    """Real decode path — requires PIL (absent here by design)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this container ships none — "
            "use fake_decode_features for plumbing tests"
        )
    raise NotImplementedError("unreachable in this environment")


def fake_decode_features(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a media decoder: pseudo
    width/height from the first two bytes, frame count from length.
    Replayable in SQL (ascii of first chars, length mod) so the full
    mapInPandas path is differential-testable."""
    b0 = data[0] if len(data) > 0 else 0
    b1 = data[1] if len(data) > 1 else 0
    return 1 + (b0 % 64), 1 + (b1 % 64), 1 + (len(data) % 7)


AUDIO_SCHEMA = (
    "doc_id bigint, n_channels int, sample_rate int, n_samples bigint, "
    "duration_sec double, rms double, peak double"
)


def decode_audio_wav(data: bytes) -> tuple[int, int, int, float, float]:
    """REAL audio decode — WAV via the stdlib ``wave`` module (no
    external codec needed): returns (channels, sample_rate, frames,
    rms, peak) with samples normalized to [-1, 1]. PCM 8/16-bit."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw} (PCM 8/16-bit only)")
    if arr.size == 0:
        return nch, sr, nf, 0.0, 0.0
    rms = float(np.sqrt(np.mean(arr * arr)))
    peak = float(np.max(np.abs(arr)))
    return nch, sr, nf, rms, peak


def extract_audio_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas over WAV ``binary`` blobs using the REAL decoder —
    the fully-working form of the decode stage (images stay gated on
    PIL; audio needs only the stdlib). Same Arrow-batched,
    partition-parallel shape as :func:`extract_media_features`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [], "n_channels": [], "sample_rate": [],
                "n_samples": [], "duration_sec": [], "rms": [], "peak": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                nch, sr, nf, rms, peak = decode_audio_wav(bytes(b))
                rows["doc_id"].append(doc_id)
                rows["n_channels"].append(nch)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(nf)
                rows["duration_sec"].append(nf / sr if sr else 0.0)
                rows["rms"].append(rms)
                rows["peak"].append(peak)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(batches, schema=AUDIO_SCHEMA)


IMAGE_BMP_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_image_bmp(data: bytes) -> tuple[int, int, float, float, float]:
    """REAL image decode for uncompressed 24-bit BMP — pure stdlib
    ``struct`` parsing, no PIL (compressed formats stay PIL-gated in
    :func:`decode_image`): returns (width, height, mean R/G/B in
    [0, 255]). Handles the 4-byte row padding and bottom-up row order
    (irrelevant to channel means, asserted for dims)."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got {bpp}bpp/c{compression})")
    abs_h = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(data, dtype=np.uint8, count=stride * abs_h, offset=pixel_off)
    px = px.reshape(abs_h, stride)[:, : width * 3].reshape(abs_h, width, 3)
    # BMP stores BGR
    means = px.astype(np.float64).mean(axis=(0, 1))
    return width, abs_h, float(means[2]), float(means[1]), float(means[0])


def extract_image_features_bmp(media_df: DataFrame) -> DataFrame:
    """mapInPandas over BMP ``binary`` blobs using the REAL stdlib
    decoder — the image counterpart of :func:`extract_audio_features`
    (same Arrow-batched, partition-parallel shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                w, h, r, g, bl = decode_image_bmp(bytes(b))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(r)
                rows["mean_g"].append(g)
                rows["mean_b"].append(bl)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(batches, schema=IMAGE_BMP_SCHEMA)


def attach_media(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Build the multimodal frame: binary payload (here derived from
    text — stand-in for real blobs) + typed metadata columns."""
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    df = df.repartition(par)  # parallelize the downstream mapInPandas
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit(media_type).alias("media_type"),
    )


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns —
    the real operator shape a decode/resize/frame-sample stage uses."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode_features(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["media"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["media"]],
                    "content_hash": [hashlib.md5(b).hexdigest() for b in pdf["media"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return media_df.mapInPandas(batches, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, media binary, media_type string, width int, height int"
)
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary, n_bytes bigint"


def resize_media(media_df: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Resize stage (stubbed decode): deterministic byte-subsampling
    stands in for pixel resampling — output blob is byte length
    ``target_w*target_h`` derived by striding the source bytes. The
    Spark shape (binary in/out mapInPandas, bounded Arrow batches) is
    exactly a real resize stage's."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in it:
            resized = []
            for b in pdf["media"]:
                if len(b) == 0:
                    resized.append(b"")
                    continue
                stride = max(1, len(b) // n_out)
                resized.append(bytes(b[::stride][:n_out]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": resized,
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media_df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage (stubbed decode): split the blob into
    ``n_frames`` contiguous chunks — one output row per frame, the
    1:N row shape a real video frame sampler produces."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                step = max(1, len(b) // n_frames) if len(b) else 1
                for i in range(n_frames):
                    chunk = bytes(b[i * step : (i + 1) * step])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(chunk)
                    rows["n_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(batches, schema=FRAMES_SCHEMA)


def media_feature_pipeline(docs: DataFrame) -> DataFrame:
    """documents → binary media column → mapInPandas features →
    metadata-only projection (blob column pruned away)."""
    feats = extract_media_features(attach_media(docs))
    return feats.select(
        "doc_id", "media_type", "n_bytes", "content_hash", "width", "height", "n_frames"
    )


def decode_image_png(data: bytes) -> tuple[int, int, float, float, float]:
    """REAL image decode for 8-bit non-interlaced RGB/RGBA PNG — pure
    stdlib ``zlib`` + chunk parsing, no PIL: returns (width, height,
    mean R/G/B in [0, 255]). All five scanline filters (None/Sub/Up/
    Average/Paeth) are reconstructed; Sub and Up vectorize, Average/
    Paeth fall back to a per-pixel loop (fine for feature-extraction
    blobs; a PIL-gated path stays the answer for big media)."""
    import struct
    import zlib

    import numpy as np

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or ctype_n not in (2, 6) or comp != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced RGB/RGBA PNG (got depth={depth} "
            f"color={ctype_n} interlace={interlace})"
        )
    ch = 3 if ctype_n == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f, line = rows[y, 0], rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumulative along the row, per channel lane
            rec = np.cumsum(line.reshape(width, ch), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        else:  # Average (3) / Paeth (4): sequential left-dependence
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) % 256
        out[y] = rec
    px = out.reshape(height, width, ch)[:, :, :3].astype(np.float64)
    means = px.mean(axis=(0, 1))
    return width, height, float(means[0]), float(means[1]), float(means[2])


def extract_image_features_raster(media_df: DataFrame) -> DataFrame:
    """mapInPandas over mixed raster blobs: sniffs BMP vs PNG per blob
    by magic bytes and dispatches to the matching stdlib decoder —
    same Arrow-batched shape and output schema as the BMP form."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                # one undecodable blob (unknown format, truncated,
                # NULL) must not kill the job — emit a null-feature
                # row and keep going, the corpus-screening contract
                try:
                    data = bytes(blob)
                    if data[:2] == b"BM":
                        w, h, r, g, bl = decode_image_bmp(data)
                    else:
                        w, h, r, g, bl = decode_image_png(data)
                except (ValueError, TypeError):
                    w = h = r = g = bl = None
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(r)
                rows["mean_g"].append(g)
                rows["mean_b"].append(bl)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(batches, schema=IMAGE_BMP_SCHEMA)
