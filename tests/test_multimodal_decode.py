"""decode_image capability probe: the real-Pillow path gets exercised
with a genuine (programmatically-built, stdlib-only) PNG the day the
lib appears in the environment; until then the stub contract holds."""

import struct
import zlib

import numpy as np
import pytest

from howard_spark.operators.multimodal import PIL_IMAGE, decode_image


def tiny_png(pixels: np.ndarray) -> bytes:
    """Minimal valid RGB PNG built with stdlib only (no Pillow needed
    to WRITE it — each scanline gets a 0 filter byte, IDAT is zlib)."""
    h, w, _ = pixels.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


PIXELS = np.array(
    [[[255, 0, 0], [0, 255, 0]],
     [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)


@pytest.mark.skipif(PIL_IMAGE is None, reason="Pillow not in environment")
def test_real_decode_roundtrips_tiny_png():
    out = decode_image(tiny_png(PIXELS), fake=False)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, PIXELS)


@pytest.mark.skipif(PIL_IMAGE is not None, reason="Pillow present")
def test_stub_raises_without_pillow():
    with pytest.raises(NotImplementedError):
        decode_image(tiny_png(PIXELS), fake=False)


def test_fake_decode_deterministic():
    p = tiny_png(PIXELS)
    a, b = decode_image(p, fake=True), decode_image(p, fake=True)
    assert a.shape == (8, 8, 3) and np.array_equal(a, b)
    assert not np.array_equal(a, decode_image(p + b"x", fake=True))
