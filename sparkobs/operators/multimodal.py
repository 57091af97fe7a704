"""Multimodal column handling (extension): opaque binary + typed metadata.

Design for image/audio/video at 100 TB: media lives in an opaque
``binary`` column (or as files behind the binaryFile source —
sparkobs.sources.listing) next to typed metadata columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch, never per row.

The decode kernels themselves are STUBBED in this container (no
image/audio libraries): ``decode_stub`` derives deterministic fake
features from the bytes, and ``decode_real`` raises NotImplementedError
with the intended library call — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "id bigint, modality string, content binary, meta map<string,string>"


def text_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media-shaped table from the documents fixture: UTF-8 bytes
    as the opaque content column + a metadata map. Stands in for real
    image/audio rows so the binary plumbing is exercised end-to-end."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def binary_stats(media: DataFrame) -> DataFrame:
    """Per-modality byte statistics — pure Catalyst over the binary
    column (no decode): count, total/mean bytes, distinct contents."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.round(F.avg(F.length("content")), 4).alias("mean_bytes"),
        F.count_distinct(F.md5(F.col("content"))).alias("n_distinct_contents"),
    )


def decode_stub(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """STUB media decode: deterministic fake features per item.

    Real pipeline shape: ``mapInPandas`` over (id, content) batches →
    one decoded-feature row per item. The fake "decoder" derives
    (width, height, n_channels, checksum) from the bytes via sha256 —
    stable across runs/engines, no media libraries needed.
    """

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            feats = []
            for _id, content in zip(pdf["id"], pdf["content"]):
                digest = hashlib.sha256(bytes(content)).digest()
                feats.append(
                    (
                        int(_id),
                        len(content),
                        # fake dims: deterministic functions of the hash
                        64 + digest[0] % 192,
                        64 + digest[1] % 192,
                        3,
                        digest.hex()[:16],
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=["id", "n_bytes", "width", "height", "n_channels", "checksum"],
            )

    return media.select("id", "content").mapInPandas(
        kernel,
        "id bigint, n_bytes bigint, width int, height int, n_channels int, checksum string",
    )


def decode_real(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real decode entry point — requires PIL/libav, absent here."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; wire PIL.Image.open / av.open into decode_stub's "
        "mapInPandas kernel — the batch plumbing is identical"
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """STUB frame sampling (video → frames): one output row per sampled
    frame, frame ids derived deterministically. Exercises the 1→N
    mapInPandas expansion shape real frame samplers use."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _id, content in zip(pdf["id"], pdf["content"]):
                n_fake_frames = min(max_frames, 1 + len(content) // (every_n * 64))
                for fi in range(n_fake_frames):
                    digest = hashlib.sha256(bytes(content) + bytes([fi])).hexdigest()
                    rows.append((int(_id), fi * every_n, digest[:12]))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_checksum"])

    return media.select("id", "content").mapInPandas(
        kernel, "id bigint, frame_idx int, frame_checksum string"
    )
