"""Multimodal (binary) column plumbing (SURVEY.md §7.2(4)).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side contract — schema, Arrow batching via
mapInPandas, partition sizing — is real and tested; the actual codec
step is stubbed (decode libraries are not in this container) behind
``decode_media``, with a deterministic fake used by tests and the
feature-extraction query.

At 100 TB: binary payloads dominate partition size, so repartition by
bytes (``spark.sql.files.maxPartitionBytes``) not rows, keep metadata
in separate columns so pruning can skip payload bytes entirely when a
query only touches metadata, and let mapInPandas stream Arrow batches
(payloads never materialize on the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # e.g. image/png
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, header_hex string, fake_width int, fake_channels int"
)


def _pil():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_media(content: bytes, media_type: str) -> dict:
    """Real decode hook with an import-guarded escape hatch: when
    Pillow is installed, ``image/*`` payloads decode for real (width /
    height / channels / format from the actual codec); otherwise — and
    for non-image media — raises ``NotImplementedError`` so callers
    fall back to :func:`fake_decode`, the deterministic byte-derived
    stand-in that keeps tests and oracles reproducible in codec-less
    environments (this container ships no media libraries)."""
    Image = _pil()
    if Image is not None and (media_type or "").startswith("image/"):
        import io

        with Image.open(io.BytesIO(content)) as im:
            return {
                "n_bytes": len(content),
                "format": im.format,
                "width": im.width,
                "height": im.height,
                "channels": len(im.getbands()),
            }
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; use fake_decode"
    )


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives 'image' properties
    from the byte stream only, so tests are reproducible anywhere."""
    n = len(content)
    return {
        "n_bytes": n,
        "header_hex": content[:4].hex(),
        "fake_width": n % 640,
        "fake_channels": (n % 3) + 1,
    }


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as a binary payload so the media
    plumbing is exercisable against the committed fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas (not a scalar pandas UDF) because a real decoder emits
    a *variable* number of rows per input (frame sampling) — this
    signature supports 1->N out of the box.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "header_hex": feats.map(lambda d: d["header_hex"]),
                    "fake_width": feats.map(lambda d: d["fake_width"]),
                    "fake_channels": feats.map(lambda d: d["fake_channels"]),
                }
            )

    return media.select("media_id", "content").mapInPandas(fn, FEATURE_SCHEMA)


REAL_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, format string, width int, height int, channels int"
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Real-codec twin of :func:`extract_features`: decodes image
    payloads through :func:`decode_media` (Pillow) inside the same
    Arrow-batched mapInPandas shape — payloads stay executor-side, the
    import happens inside the task (workers need the lib, the driver
    plan does not). Raises on codec-less environments; the oracle-gated
    queries keep using the deterministic fake path."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(bytes(c), mt)
                for c, mt in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "format": [f["format"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                }
            )

    return media.select("media_id", "content", "media_type").mapInPandas(
        fn, REAL_FEATURE_SCHEMA
    )


FRAME_SCHEMA = "media_id long, frame_no int, frame_bytes int, frame_md5 string"


def sample_frames(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """1 -> N frame sampling over binary payloads (the video/audio
    chunking shape): each media row emits one row per fixed-size byte
    window. mapInPandas lets a single input batch yield any number of
    output rows; on a cluster the expansion happens executor-side with
    no driver involvement, and downstream repartition re-balances the
    fan-out."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_no": [], "frame_bytes": [], "frame_md5": []
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                for fno, off in enumerate(range(0, len(data), frame_bytes)):
                    chunk = data[off : off + frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(fn, FRAME_SCHEMA)


RESIZE_SCHEMA = "media_id long, in_bytes long, out_bytes long, thumb_hex string"


def fake_resize(content: bytes, stride: int = 4, cap: int = 64) -> dict:
    """Deterministic stand-in for an image resize/thumbnail: keep every
    ``stride``-th byte, capped at ``cap`` bytes — byte-derived only, so
    reproducible anywhere (a real resizer plugs in via decode_media)."""
    data = bytes(content)
    sampled = data[::stride][:cap]
    return {
        "in_bytes": len(data),
        "out_bytes": len(sampled),
        "thumb_hex": sampled.hex(),
    }


def resize_media(media: DataFrame, stride: int = 4, cap: int = 64) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads (the image-thumbnail
    shape): one output row per media row with the downsampled payload
    as hex. Narrow mapInPandas stage — no shuffle, executor-side only;
    the stride/cap keep output bounded regardless of input size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs = pdf["content"].map(lambda c: fake_resize(c, stride, cap))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "in_bytes": rs.map(lambda d: d["in_bytes"]),
                    "out_bytes": rs.map(lambda d: d["out_bytes"]),
                    "thumb_hex": rs.map(lambda d: d["thumb_hex"]),
                }
            )

    return media.select("media_id", "content").mapInPandas(fn, RESIZE_SCHEMA)


PHASH_SCHEMA = "media_id long, dhash long, n_bytes int"


def perceptual_hash(media: DataFrame, n_bits: int = 48) -> DataFrame:
    """dHash-style perceptual fingerprint per media payload: sample
    ``n_bits + 1`` bytes at a payload-length stride and set bit i when
    sample i is brighter than sample i+1 — the gradient hash that is
    stable under re-encoding/minor edits, unlike the exact frame md5.
    Arrow-batched mapInPandas over (media_id, content); with a real
    codec the same kernel would hash the decoded luminance plane — the
    byte-domain stand-in keeps the fingerprint deterministic and
    oracle-reproducible in codec-less environments. 48 bits so the
    fingerprint (and every band key derived from it) stays inside a
    signed 64-bit integer in any engine."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                n = len(b)
                h = 0
                if n >= 1:
                    stride = max(n // (n_bits + 1), 1)
                    for i in range(n_bits):
                        if b[(i * stride) % n] > b[((i + 1) * stride) % n]:
                            h |= 1 << i
                out.append((mid, h, n))
            yield pd.DataFrame(out, columns=["media_id", "dhash", "n_bytes"])

    return media.select("media_id", "content").mapInPandas(fn, PHASH_SCHEMA)


ENERGY_SCHEMA = "media_id long, win int, energy long"


def waveform_energy_windows(media: DataFrame, window_bytes: int = 64) -> DataFrame:
    """Audio-shaped windowed energy over binary payloads: treat each
    byte as an unsigned 8-bit PCM sample centered at 128 and emit one
    row per ``window_bytes`` window with its exact integer energy
    Σ(b-128)² — the voice-activity / silence-trim primitive, 1->N per
    payload like frame sampling. The kernel is a vectorized numpy pass
    inside Arrow-batched mapInPandas (the real shape for real audio);
    energies are integers so the whole output is oracle-checkable
    against a byte-arithmetic SQL replay (exact for the ASCII fixtures,
    where codepoint == byte — same caveat as the other media oracles).
    Partial tail windows aggregate only their real bytes."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, energies = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.int64)
                d = (b - 128) ** 2
                for w in range(0, len(d), window_bytes):
                    ids.append(mid)
                    wins.append(w // window_bytes)
                    energies.append(int(d[w : w + window_bytes].sum()))
            yield pd.DataFrame({"media_id": ids, "win": wins, "energy": energies})

    return media.select("media_id", "content").mapInPandas(fn, ENERGY_SCHEMA)
