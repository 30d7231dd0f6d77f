"""Baseline JPEG pixel decoder vs an INDEPENDENT decoder.

The oracle is javax.imageio (the JDK's libjpeg-derived native JPEG
reader) reached through the session JVM: the oracle decodes the same
bytes and hands the pixels back as an uncompressed BMP (parsed here
with numpy — no dependence on any of our decoders). Fixtures are
real libjpeg-encoded files shipped with CPython / IPython / the Rust
docs in this container — produced by an encoder we had no hand in.

T.81 permits small IDCT implementation differences and libjpeg's
fixed-point color conversion differs from our float path by ±1, so
comparisons assert tight-but-not-bitwise bounds; the structural
properties (dimensions, channel order, upsampling geometry) must be
exact.
"""

import glob
import os

import numpy as np
import pytest

from minicrawler_spark.operators.jpeg import (
    JpegError,
    ZIGZAG,
    _IDCT_A,
    _build_huffman_lut,
    decode_jpeg_pixels,
)

FIXTURES = {
    "py420": glob.glob(
        "/root/.pyenv/versions/3.1*/lib/python3.1*/test/imghdrdata/"
        "python-raw.jpg"
    ),
    "gray": glob.glob(
        "/root/.pyenv/versions/3.11*/lib/python3.11/site-packages/"
        "IPython/core/tests/2x2.jpg"
    ),
    "photo444_dri": glob.glob(
        "/root/.rustup/toolchains/stable-*/share/doc/rust/html/"
        "embedded-book/assets/verify.jpeg"
    ),
    "progressive": glob.glob(
        "/root/.rustup/toolchains/stable-*/share/doc/rust/html/"
        "embedded-book/assets/f3.jpg"
    ),
}


def _fixture(name):
    paths = FIXTURES[name]
    if not paths:
        pytest.skip("fixture %s not present in this container" % name)
    return open(paths[0], "rb").read()


def _oracle_rgb(spark, data: bytes) -> np.ndarray:
    """javax.imageio decode -> BMP bytes -> (H, W, 3) uint8 RGB."""
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(bis)
    assert img is not None, "ImageIO could not decode fixture"
    # force 3-byte BGR so the BMP is always 24-bit
    t3 = jvm.java.awt.image.BufferedImage(
        img.getWidth(), img.getHeight(),
        jvm.java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
    )
    g = t3.getGraphics()
    g.drawImage(img, 0, 0, None)
    g.dispose()
    baos = jvm.java.io.ByteArrayOutputStream()
    ok = jvm.javax.imageio.ImageIO.write(t3, "bmp", baos)
    assert ok
    bmp = bytes(baos.toByteArray())
    # minimal BMP parse: 24bpp bottom-up, BGR, rows padded to 4 bytes
    assert bmp[:2] == b"BM"
    off = int.from_bytes(bmp[10:14], "little")
    w = int.from_bytes(bmp[18:22], "little", signed=True)
    h = int.from_bytes(bmp[22:26], "little", signed=True)
    bpp = int.from_bytes(bmp[28:30], "little")
    assert bpp == 24
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        bmp[off:off + stride * abs(h)], dtype=np.uint8
    ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def test_zigzag_is_an_involution_free_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spot-check published entries of T.81 Figure A.6
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63 and ZIGZAG[33] == 42 and ZIGZAG[35] == 56


def test_idct_matches_textbook_definition():
    rng = np.random.default_rng(7)
    F = rng.integers(-512, 512, size=(8, 8)).astype(np.float64)
    fast = _IDCT_A @ F @ _IDCT_A.T
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            slow[x, y] = s
    assert np.abs(fast - slow).max() < 1e-9


def test_huffman_lut_canonical_codes():
    # 2 codes of length 1 is illegal; use the canonical example from
    # T.81 C.2: lengths (0,1,5,1,...) style — here: one 2-bit code,
    # two 3-bit codes. Canonical assignment: 00, 010, 011.
    bits = [0, 1, 2] + [0] * 13
    huffval = [7, 3, 9]
    codelen, symbol = _build_huffman_lut(bytes(bits), bytes(huffval))
    assert codelen[0b0000000000000000] == 2 and symbol[0] == 7
    assert codelen[0b0100000000000000] == 3
    assert symbol[0b0100000000000000] == 3
    assert codelen[0b0110000000000000] == 3
    assert symbol[0b0110000000000000] == 9
    # prefix 11 unassigned at length 2; LUT must mark longer-prefix
    # slots invalid (0) unless covered by a longer code
    assert codelen[0b1100000000000000] == 0


def test_dc_only_flat_block_decodes_to_known_value():
    """A hand-built minimal JPEG: 8x8 grayscale, quant table all 1s,
    single DC coefficient 64 -> every sample = 128 + 64/8 = 136."""
    import struct as st

    def seg(marker, payload):
        return b"\xff" + bytes([marker]) + st.pack(
            ">H", len(payload) + 2
        ) + payload

    zz = bytes(64)  # identity quant table (all 1s below)
    qt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + st.pack(">HH", 8, 8)
              + bytes([1, 1, 0x11, 0]))
    # DC table: one 2-bit code for symbol 7 (7 extra bits)
    dht_dc = seg(0xC4, bytes([0x00, 0, 1] + [0] * 14 + [7]))
    # AC table: one 2-bit code for symbol 0x00 (EOB)
    dht_ac = seg(0xC4, bytes([0x10, 0, 1] + [0] * 14 + [0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy: DC code 00 + 7 magnitude bits of +64 = 1000000,
    # then AC EOB = 00 -> bits 00 1000000 00 + padding 1s
    scan = bytes([0b00100000, 0b00011111])
    data = b"\xff\xd8" + qt + sof + dht_dc + dht_ac + sos + scan + b"\xff\xd9"
    px = decode_jpeg_pixels(data)
    assert px.shape == (8, 8, 3)
    assert (px == 136).all()
    _ = zz


class TestAgainstImageIO:
    def test_photo_444_with_restart_markers(self, spark):
        data = _fixture("photo444_dri")
        mine = decode_jpeg_pixels(data)
        ref = _oracle_rgb(spark, data)
        assert mine.shape == ref.shape
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.mean() < 0.6, diff.mean()
        assert np.percentile(diff, 99.9) <= 2.0
        assert diff.max() <= 4

    def test_small_420(self, spark):
        data = _fixture("py420")
        mine = decode_jpeg_pixels(data)
        ref = _oracle_rgb(spark, data)
        assert mine.shape == ref.shape
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.mean() < 2.0, diff.mean()

    def test_grayscale(self, spark):
        data = _fixture("gray")
        mine = decode_jpeg_pixels(data)
        ref = _oracle_rgb(spark, data)
        assert mine.shape == ref.shape
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.max() <= 2


class TestProgressiveAgainstImageIO:
    def test_progressive_photo_2x1(self, spark):
        """f3.jpg: SOF2, 10 scans (DC+AC spectral selection with two
        successive-approximation refinement levels), 2x1 sampling."""
        data = _fixture("progressive")
        mine = decode_jpeg_pixels(data)
        ref = _oracle_rgb(spark, data)
        assert mine.shape == ref.shape
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.mean() < 1.0, diff.mean()
        assert np.percentile(diff, 99) <= 3.0


def test_non_dct_frames_raise_the_documented_seam():
    import struct as st
    # SOF3 (lossless) frame header
    sof3 = (b"\xff\xd8" + b"\xff\xc3" + st.pack(">H", 11)
            + bytes([8]) + st.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(sof3 + b"\xff\xd9")


def test_malformed_inputs_raise_jpeg_error():
    with pytest.raises(JpegError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xdb\x00\x02")
    with pytest.raises((JpegError, ValueError)):
        decode_jpeg_pixels(b"not a jpeg at all")
    good = _fixture("py420")
    with pytest.raises((JpegError, NotImplementedError, ValueError)):
        decode_jpeg_pixels(good[:60])
