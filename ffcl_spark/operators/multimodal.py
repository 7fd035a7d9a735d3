"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata structs. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` kernels — schema, partitioning, UDF signature, and
batch shape are the engine surface; the codecs are real for the
container-friendly formats:

- ``image/ppm``: P6 binary PPM — pure-NumPy header parse + pixel
  reshape (``decode_real`` → (h, w, 3) uint8).
- ``audio/wav``: RIFF/WAVE PCM16 — chunk walk + ``np.frombuffer``
  (``decode_real`` → (n_samples, n_channels) int16).

Formats that genuinely need external codec libraries (JPEG, MP3, …)
still raise ``NotImplementedError`` naming the dependency;
``media_binary(docs, payload=...)`` can synthesize deterministic real
PPM/WAV payloads so the decode path runs end-to-end in tests and
gates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
    ]
)

# frames per synthesized "video" payload (payload='ppmseq')
SEQ_FRAMES = 4

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_crc", T.LongType()),
    ]
)


def media_binary(docs: DataFrame, payload: str = "ref") -> DataFrame:
    """Materialize media spans as binary payloads. In a real
    deployment ``media_ref`` resolves to object storage; here the
    payload is synthesized deterministically from the ref:

    - ``payload='ref'``: the ref string utf-8 encoded (opaque-bytes
      plumbing path, kind ``image/fake``);
    - ``payload='ppm'``: a real 8×6 binary PPM image whose pixels are
      a seeded byte stream of the ref (kind ``image/ppm``);
    - ``payload='wav'``: a real RIFF/WAVE PCM16 mono clip, 64 samples
      derived from the ref (kind ``audio/wav``).
    """
    s = F.explode("spans").alias("span")
    base = (
        docs.select("doc_id", s)
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.offset").alias("offset"),
            F.col("span.media_ref").alias("ref"),
        )
    )
    if payload == "ref":
        return base.select(
            "doc_id",
            "offset",
            F.encode(F.col("ref"), "utf-8").alias("media_bytes"),
            F.lit("image/fake").alias("media_kind"),
        )
    if payload not in ("ppm", "wav", "ppmseq"):
        raise ValueError(f"unknown payload kind {payload!r}")
    kind = {"ppm": "image/ppm", "wav": "audio/wav", "ppmseq": "video/ppmseq"}[payload]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ref in pdf["ref"]:
                if payload == "ppmseq":
                    # a "video": SEQ_FRAMES concatenated P6 frames, each
                    # seeded by (ref, frame index) so frames differ
                    blobs.append(
                        b"".join(
                            encode_ppm(
                                _ref_bytes(f"{ref}#f{i}", 8 * 6 * 3).reshape(6, 8, 3)
                            )
                            for i in range(SEQ_FRAMES)
                        )
                    )
                    continue
                raw = _ref_bytes(ref, 8 * 6 * 3 if payload == "ppm" else 128)
                blobs.append(
                    encode_ppm(raw.reshape(6, 8, 3))
                    if payload == "ppm"
                    else encode_wav_pcm16(
                        (raw[:128].view(np.uint8).astype(np.int16) * 128 - 16384)
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"].astype("int32"),
                    "media_bytes": blobs,
                    "media_kind": kind,
                }
            )

    return base.mapInPandas(kernel, MEDIA_SCHEMA)


def _ref_bytes(ref: str, n: int) -> np.ndarray:
    """Deterministic pseudo-random byte stream keyed by the ref string
    (splitmix-style mixing — reproducible anywhere, no RNG state)."""
    # FNV-1a over Python ints: the & mask IS the intended uint64
    # wraparound, and doing it scalar-side avoids NumPy's per-batch
    # scalar-overflow RuntimeWarning (bit-identical to the uint64 form)
    h = 2166136261
    for ch in ref.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFFFFFFFFFF
    idx = np.arange(n, dtype=np.uint64) + np.uint64(h)
    idx = (idx ^ (idx >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    idx = idx ^ (idx >> np.uint64(33))
    return (idx & np.uint64(0xFF)).astype(np.uint8)


# --------------------------------------------------------------- codecs
# Pure-NumPy encoders/decoders for the two container-friendly formats.


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Header = magic, width,
    height, maxval as whitespace-separated tokens (comments allowed),
    then one whitespace byte and the raw pixel block."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    i += 1  # single whitespace after maxval
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) or (n, ch) int16 → RIFF/WAVE PCM16 bytes."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    payload = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → ((n_samples, n_channels) int16, rate).
    Chunk-walking parse — tolerates extra chunks before ``data``."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    ch = rate = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack("<HHI", data[i + 8 : i + 16])
            if audio_fmt != 1:
                raise NotImplementedError("only PCM wav supported")
        elif cid == b"data":
            if ch is None:
                raise ValueError("data chunk before fmt")
            s = np.frombuffer(data, dtype="<i2", count=size // 2, offset=i + 8)
            return s.reshape(-1, ch), rate
        i += 8 + size + (size & 1)
    raise ValueError("no data chunk")


def ppm_frame_size(data: bytes, offset: int = 0) -> tuple[int, int, int]:
    """Parse one P6 header starting at ``offset``; return (width,
    height, total frame byte length including header). Lets a
    concatenated-PPM "video" buffer be walked frame by frame without
    copying pixels."""
    if data[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 frame at offset %d" % offset)
    tokens: list[bytes] = []
    i = offset + 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    i += 1  # single whitespace after maxval
    return w, h, (i - offset) + w * h * 3


def split_ppm_frames(data: bytes) -> list[np.ndarray]:
    """Concatenated P6 frames → list of (h, w, 3) uint8 arrays."""
    frames, off = [], 0
    while off < len(data):
        w, h, size = ppm_frame_size(data, off)
        frames.append(decode_ppm(data[off : off + size]))
        off += size
    return frames


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure NumPy index gather (the classic
    floor((i + 0.5) * in/out) source mapping — deterministic, no
    interpolation state)."""
    h, w, _ = img.shape
    yi = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64).clip(0, h - 1)
    xi = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64).clip(0, w - 1)
    return img[yi][:, xi]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Arrow-batched image resize: PPM in → nearest-neighbor resized
    PPM out (real decode → NumPy gather → real re-encode; no codec
    stub). Non-image kinds raise loudly — route audio through
    ``extract_features_decoded`` / video through ``sample_frames``.

    Plan shape: ``mapInPandas`` over whatever partitioning the media
    table already has — per-row independent, zero shuffle, and the
    binary column never crosses Python row-at-a-time (one Arrow batch
    in, one out)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob, kind in zip(pdf["media_bytes"], pdf["media_kind"]):
                if kind != "image/ppm":
                    raise NotImplementedError(f"resize_images on {kind!r}")
                blobs.append(
                    encode_ppm(resize_nearest(decode_ppm(bytes(blob)), out_w, out_h))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"].astype("int32"),
                    "media_bytes": blobs,
                    "media_kind": pdf["media_kind"],
                    "width": pd.array([out_w] * len(pdf), dtype="int32"),
                    "height": pd.array([out_h] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sample_frames(
    media: DataFrame, every: int = 2, max_frames: int | None = None
) -> DataFrame:
    """Deterministic frame sampling over ``video/ppmseq`` payloads
    (concatenated P6 frames): keep frames 0, every, 2·every, … up to
    ``max_frames``, emitting one row per kept frame with the frame
    re-encoded as a standalone ``image/ppm`` payload — the output is
    directly consumable by ``resize_images`` / ``extract_features_decoded``.

    The fan-out happens inside the Arrow kernel (no explode shuffle);
    output rows ≤ ceil(SEQ_FRAMES/every) per video, so partition sizes
    stay bounded by the input batch size × a small constant."""
    if every < 1:
        raise ValueError("every must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "offset": [],
                "frame_idx": [],
                "media_bytes": [],
                "width": [],
                "height": [],
            }
            for doc_id, off, blob, kind in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_bytes"], pdf["media_kind"]
            ):
                if kind != "video/ppmseq":
                    raise NotImplementedError(f"sample_frames on {kind!r}")
                frames = split_ppm_frames(bytes(blob))
                kept = frames[::every]
                if max_frames is not None:
                    kept = kept[:max_frames]
                for i, frame in enumerate(kept):
                    out["doc_id"].append(doc_id)
                    out["offset"].append(off)
                    out["frame_idx"].append(i * every)
                    out["media_bytes"].append(encode_ppm(frame))
                    out["height"].append(frame.shape[0])
                    out["width"].append(frame.shape[1])
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "offset": pd.array(out["offset"], dtype="int32"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "media_bytes": out["media_bytes"],
                    "media_kind": ["image/ppm"] * len(out["doc_id"]),
                    "width": pd.array(out["width"], dtype="int32"),
                    "height": pd.array(out["height"], dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def decode_real(media_kind: str, data: bytes | None = None):
    """Real decode for the supported formats; raises NotImplementedError
    naming the needed dependency for formats this container can't
    handle without codec libraries."""
    if media_kind == "image/ppm":
        return decode_ppm(data)
    if media_kind == "audio/wav":
        return decode_wav_pcm16(data)[0]
    raise NotImplementedError(
        f"real decode for {media_kind!r} needs an image/audio codec "
        "library (e.g. Pillow / torchaudio) that is not installed; "
        "use payload='ppm'/'wav' media or decode_stub for plumbing"
    )


def extract_features(media: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    The kernel sees pandas batches of (doc_id, offset, media_bytes);
    per batch it vectorizes over the byte payloads. Features here are
    the kind-agnostic opaque-bytes signals (length, mean byte, crc32);
    the decoded transforms live in ``extract_features_decoded``,
    ``resize_images`` and ``sample_frames``.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            payloads = pdf["media_bytes"]
            n_bytes = payloads.map(len).astype("int32")
            byte_mean = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
            )
            crc = payloads.map(lambda b: zlib.crc32(b)).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"].astype("int32"),
                    "n_bytes": n_bytes,
                    "byte_mean": byte_mean,
                    "byte_crc": crc,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features_decoded(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode + feature extraction: PPM images →
    (width, height, per-channel mean); WAV audio → (n_samples, 1,
    per-channel mean amplitude). The decode step is the pure-NumPy
    codec — no stub in this path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means = [], [], []
            for blob, kind in zip(pdf["media_bytes"], pdf["media_kind"]):
                if kind == "image/ppm":
                    img = decode_ppm(bytes(blob))
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                    means.append(img.astype(np.float64).mean(axis=(0, 1)).tolist())
                elif kind == "audio/wav":
                    s, _ = decode_wav_pcm16(bytes(blob))
                    heights.append(1)
                    widths.append(s.shape[0])
                    means.append(s.astype(np.float64).mean(axis=0).tolist())
                else:
                    raise NotImplementedError(kind)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"].astype("int32"),
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "channel_means": means,
                }
            )

    return media.mapInPandas(kernel, DECODED_SCHEMA)
