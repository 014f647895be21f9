"""Multimodal plumbing: binary columns + typed metadata through real
mapInPandas seams (decode itself stubbed — no codec libs here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pcap_to_parquet_spark.operators.multimodal import (
    media_table,
    resize_images,
    sample_frames,
)
from pcap_to_parquet_spark.sources.tables import load_table
from tests.conftest import SF0001


def _media(spark):
    return media_table(load_table(spark, SF0001, "documents").limit(20))


def test_resize_plumbing(spark):
    out = resize_images(_media(spark), 224, 224)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 224 and r.height == 224 for r in rows)
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)


def test_sample_frames_fanout(spark):
    media = _media(spark)
    frames = sample_frames(media, every_n_bytes=64)
    n_bytes = media.select(F.sum(F.length("payload"))).first()[0]
    got = frames.count()
    # ceil-division fan-out: one frame per 64-byte slice
    per_doc = media.select(F.ceil(F.length("payload") / 64).alias("k"))
    want = per_doc.select(F.sum("k")).first()[0]
    assert got == want
    # frame indices are dense per media_id
    idx = frames.groupBy("media_id").agg(
        F.min("frame_idx").alias("mn"), F.max("frame_idx").alias("mx"), F.count("*").alias("n")
    )
    bad = idx.filter((F.col("mn") != 0) | (F.col("n") != F.col("mx") + 1)).count()
    assert bad == 0
    assert n_bytes == frames.select(F.sum(F.length("frame"))).first()[0]


def test_real_codecs_stubbed(spark):
    img = _media(spark).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/png").alias("mime"),
            F.lit(224).alias("width"),
            F.lit(224).alias("height"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_images(img, 64, 64).collect()
