"""ADVICE r5 regressions: crafted/corrupt media must degrade to
per-row decode_error rows — never a task failure — and foreign WARC
archives must keep their URI bytes verbatim.

The three reproduced crashers: a JPEG SOF with a zero sampling-factor
nibble (was ZeroDivisionError in the scan decoder), a truncated SOS
segment (IndexError), and a truncated GIF image descriptor
(IndexError)."""

import struct as st

import pytest

from minicrawler_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    decode_pixels,
)


def _seg(marker, payload):
    return b"\xff" + bytes([marker]) + st.pack(">H", len(payload) + 2) + payload


def _jpeg_zero_sampling():
    """Valid-looking baseline JPEG whose SOF component has hv=0x00."""
    qt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + st.pack(">HH", 8, 8)
               + bytes([1, 1, 0x00, 0]))  # hv nibbles both zero
    dht_dc = _seg(0xC4, bytes([0x00, 0, 1] + [0] * 14 + [7]))
    dht_ac = _seg(0xC4, bytes([0x10, 0, 1] + [0] * 14 + [0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    scan = bytes([0b00100000, 0b00011111])
    return (b"\xff\xd8" + qt + sof + dht_dc + dht_ac + sos + scan
            + b"\xff\xd9")


def _jpeg_truncated_sos():
    """SOS segment whose declared length exceeds the payload bytes."""
    qt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + st.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    dht_dc = _seg(0xC4, bytes([0x00, 0, 1] + [0] * 14 + [7]))
    # SOS claims 1 component but the component spec bytes are cut off
    sos = b"\xff\xda" + st.pack(">H", 8) + bytes([2, 1])
    return b"\xff\xd8" + qt + sof + dht_dc + sos


def _gif_truncated_descriptor():
    """GIF header + image separator with the descriptor cut off."""
    return (b"GIF89a" + st.pack("<HH", 4, 4) + bytes([0x80, 0, 0])
            + b"\x00\x00\x00\xff\xff\xff" + b"\x2c\x00")


_CORRUPT = [
    ("img://jpeg-hv0", "image/jpeg", _jpeg_zero_sampling()),
    ("img://jpeg-sos", "image/jpeg", _jpeg_truncated_sos()),
    ("img://gif-desc", "image/gif", _gif_truncated_descriptor()),
]


def _media_df(spark):
    return spark.createDataFrame(
        [(ref, "image", ct, bytearray(data)) for ref, ct, data in _CORRUPT],
        MEDIA_SCHEMA,
    )


def test_decode_pixels_corrupt_media_degrades_per_row(spark):
    out = {r["media_ref"]: r for r in decode_pixels(_media_df(spark)).collect()}
    assert len(out) == len(_CORRUPT)
    for ref, _ct, _data in _CORRUPT:
        assert out[ref]["pixels"] is None, ref
        assert out[ref]["decode_error"], ref


def test_decode_and_featurize_corrupt_media_never_fails_task(spark):
    # featurize only parses headers, so a structurally-parseable frame
    # (the hv=0 SOF) may still yield metadata — the contract is one
    # row per input and no task failure
    out = {
        r["media_ref"]: r
        for r in decode_and_featurize(_media_df(spark)).collect()
    }
    assert len(out) == len(_CORRUPT)


def test_zero_sampling_factor_is_jpeg_error():
    from minicrawler_spark.operators.jpeg import JpegError, decode_jpeg_pixels

    with pytest.raises(JpegError):
        decode_jpeg_pixels(_jpeg_zero_sampling())
    assert issubclass(JpegError, ValueError)  # caught by decode_* tuples


def test_foreign_warc_uri_bytes_verbatim(spark, tmp_path):
    """A WARC written by OTHER software keeps percent-encoded URLs
    byte-for-byte ('a%20b' stays 'a%20b'); this engine's own archives
    still unescape their writer-side escaping (ADVICE r5)."""
    import gzip

    from minicrawler_spark.sources.warc import read_warc

    url = "http://x.example/a%20b?p=%25"
    body = b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:1>\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "WARC-Target-URI: %s\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "Content-Length: %d\r\n\r\n" % (url, len(body))
    ).encode() + body + b"\r\n\r\n"
    p = tmp_path / "foreign.warc.gz"
    p.write_bytes(gzip.compress(rec))
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == url  # bytes preserved, no %-decode


def test_own_warc_space_url_still_roundtrips(spark, tmp_path):
    """The writer escapes a raw space in WARC-Target-URI; reading the
    own archive (detected via its warcinfo record) restores it."""
    from minicrawler_spark.sources.warc import read_warc, write_warc

    rows = [
        {
            "url": "http://x.example/a b", "status": 200,
            "content_type": "text/plain", "charset": "utf-8",
            "body": bytearray(b"ok"), "elapsed_ms": 5,
            "outcome": "done",
        }
    ]
    df = spark.createDataFrame(
        rows,
        "url string, status int, content_type string, charset string, "
        "body binary, elapsed_ms long, outcome string",
    )
    out_dir = str(tmp_path / "own")
    write_warc(df, out_dir).collect()  # manifest action performs the write
    got = read_warc(spark, out_dir).collect()
    assert len(got) == 1
    assert got[0]["url"] == "http://x.example/a b"
