"""Multimodal decode paths: the deterministic fake (always available,
oracle-backed) and the Pillow escape hatch (runs only where a real
codec exists — this container has none, so the real-decode test
documents itself as an environment skip, not a gap)."""

from __future__ import annotations

import pytest

from etl_8million_data__spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    extract_image_features,
    fake_decode,
)

_HAS_PIL = True
try:
    import PIL  # noqa: F401
except ImportError:
    _HAS_PIL = False


def test_decode_media_raises_without_codec():
    if _HAS_PIL:
        pytest.skip("Pillow present: the raise path is codec-less only")
    with pytest.raises(NotImplementedError, match="use fake_decode"):
        decode_media(b"\x89PNG....", "image/png")


def test_decode_media_raises_for_non_image_even_with_codec():
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF....", "audio/wav")


def test_fake_decode_is_deterministic():
    a = fake_decode(b"hello world, hello spark")
    assert a == fake_decode(b"hello world, hello spark")
    assert a["n_bytes"] == 24 and a["header_hex"] == b"hell".hex()


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed in this container")
def test_real_decode_roundtrip(spark):
    """When a codec exists, decode_media returns the actual image
    geometry and extract_image_features runs it Arrow-batched."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    png = buf.getvalue()

    d = decode_media(png, "image/png")
    assert (d["width"], d["height"], d["channels"], d["format"]) == (12, 7, 3, "PNG")

    media = spark.createDataFrame(
        [(1, bytearray(png), "image/png", {})],
        "media_id long, content binary, media_type string, meta map<string,string>",
    )
    row = extract_image_features(media).collect()[0]
    assert (row.width, row.height, row.channels) == (12, 7, 3)


def test_documents_as_media_schema(spark):
    docs = spark.createDataFrame(
        [(1, "some text", "web")], "doc_id long, text string, source string"
    )
    m = documents_as_media(docs).collect()[0]
    assert bytes(m.content) == b"some text" and m.media_type == "text/plain"
