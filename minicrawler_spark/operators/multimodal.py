"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-rule addition). The Spark-side plumbing — schemas,
Arrow batch shapes, partitioning — is real and tested; the actual
codec work is stubbed deterministically because the image/audio
libraries are not in this container. Swap `_decode_image_stub` for a
PIL/libvips call in production; the mapInPandas contract is unchanged.
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


def _decode_image_stub(data: bytes):
    """Deterministic fake decode: dimensions + a 64-byte feature
    derived from the content hash. Raises on non-PNG magic the way a
    real decoder raises on corrupt input. Replace with PIL/pyvips in
    production (NotImplementedError marks the seam). The ASCII
    'PNGSTUB:' magic is accepted for cross-engine oracle tests (the
    DuckDB sha256 only takes VARCHAR, so oracle inputs stay UTF-8)."""
    if not (data.startswith(b"\x89PNG") or data.startswith(b"PNGSTUB:")):
        raise NotImplementedError("real decoder not available; non-PNG input")
    h = hashlib.sha256(data).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feature = hashlib.sha256(b"feat" + data).digest() * 2  # 64 bytes
    return width, height, feature


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
                    w, h, feat = _decode_image_stub(data)
                    rec.update({"width": w, "height": h, "feature": feat})
                except NotImplementedError as e:
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
