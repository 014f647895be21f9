"""Multimodal columns: opaque binary payloads + typed metadata.

Convention (SURVEY §2 Part B): media is a ``binary`` column plus a
``struct`` metadata column (kind, mime, width, height, …). The pcap
``data`` column is the network instance of the same convention.

The decode step that would call image/audio libraries is STUBBED
(those libs are not in this container): :func:`decode_media_batch`
raises ``NotImplementedError`` for real codecs and provides a
deterministic fake for ``kind='text'`` payloads — the Spark-side
plumbing (schema, mapInPandas signature, Arrow batch shape,
partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType()),
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("kind", StringType()),
    ]
)

_REAL_CODECS = {"image", "audio", "video"}


def media_table(documents: DataFrame) -> DataFrame:
    """documents → media table: the text bytes stand in for an opaque
    payload; metadata is typed. Real pipelines load payloads via
    ``binaryFile`` scans exactly like sources/pcap.py does."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_media_batch(batches) -> Iterator:  # type: ignore[no-untyped-def]
    """mapInPandas worker: binary payload → feature rows.

    Arrow ships each partition's payloads as contiguous batches; this
    function is the seam where PIL/librosa/av decode would run
    (resize, frame-sample, spectrogram). Those codecs are stubbed:
    non-text kinds raise NotImplementedError by design.
    """
    import hashlib

    import pandas as pd

    for pdf in batches:
        kinds = pdf["meta"].map(lambda m: m["kind"])
        if kinds.isin(_REAL_CODECS).any():
            raise NotImplementedError(
                "image/audio/video decode requires codec libraries not present "
                "in this environment; text payloads demonstrate the plumbing"
            )
        payloads = pdf["payload"].map(bytes)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "kind": kinds,
            }
        )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """image payloads → resized payloads (mapInPandas seam).

    The PIL decode/resize is STUBBED (no codec libs in this
    environment): image kinds raise NotImplementedError; the plumbing
    — Arrow batch shape, schema, partition-preserving map — is real
    and tested with text payloads standing in as opaque bytes."""

    def do_resize(batches):  # type: ignore[no-untyped-def]
        import pandas as pd

        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            if kinds.isin(_REAL_CODECS).any():
                raise NotImplementedError(
                    "PIL/av resize requires codec libraries not in this environment"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # identity for non-image kinds
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """video payloads → sampled frames (one row per frame; UDTF-shaped
    mapInPandas). Real decoders (av/ffmpeg) are stubbed; the
    deterministic fake slices the payload every ``every_n_bytes`` so
    batch fan-out (one input row → many output rows) is exercised for
    real."""

    def do_sample(batches):  # type: ignore[no-untyped-def]
        import pandas as pd

        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            if kinds.isin(_REAL_CODECS).any():
                raise NotImplementedError(
                    "frame sampling requires av/ffmpeg, not in this environment"
                )
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i, start in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[start : start + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(do_sample, schema=FRAME_SCHEMA)


@query(
    "q_multimodal_features",
    """
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           'text' AS kind
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the real mapInPandas
    path; the oracle recomputes the features from the source text
    (payload bytes == UTF-8 text bytes, so md5/length agree)."""
    d = load_table(spark, sf_dir, "documents")
    return media_table(d).mapInPandas(decode_media_batch, schema=FEATURE_SCHEMA)
