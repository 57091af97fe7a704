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


#: decode_real output schema: one row per item, image and audio fields
#: unioned (nulls for the non-applicable modality), plus an error
#: column instead of a poisoned task — at 100 TB a corrupt file must
#: not kill the stage.
DECODE_SCHEMA = (
    "id bigint, format string, kind string, width int, height int, "
    "n_channels int, n_samples bigint, sample_rate int, "
    "mean_value double, error string"
)


def _decode_one(content: bytes):
    """Decode one media payload with stdlib + numpy only.

    Really-executable formats (no external libraries):
    - WAV  (RIFF/WAVE)  — stdlib ``wave`` + numpy PCM stats;
    - BMP  (24/32-bit uncompressed) — header struct + numpy reshape;
    - PPM/PGM (netpbm P6/P5 binary) — header parse + numpy.

    Anything else falls through to PIL when importable, else returns an
    error row. Returns (format, kind, width, height, n_channels,
    n_samples, sample_rate, mean_value, error).
    """
    import io
    import struct

    import numpy as np

    b = bytes(content)
    try:
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            import wave

            with wave.open(io.BytesIO(b)) as w:
                nch, sw, rate, nframes = (
                    w.getnchannels(),
                    w.getsampwidth(),
                    w.getframerate(),
                    w.getnframes(),
                )
                raw = w.readframes(nframes)
            dt = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
            mean = (
                float(np.abs(np.frombuffer(raw, dtype=dt).astype(np.float64)).mean())
                if dt is not None and len(raw)
                else None
            )
            return ("wav", "audio", None, None, nch, nframes, rate, mean, None)
        if b[:2] == b"BM" and len(b) > 54:
            data_off = struct.unpack_from("<I", b, 10)[0]
            width, height = struct.unpack_from("<ii", b, 18)
            bpp = struct.unpack_from("<H", b, 28)[0]
            compression = struct.unpack_from("<I", b, 30)[0]
            if compression != 0 or bpp not in (24, 32):
                return ("bmp", "image", width, abs(height), None, None, None, None,
                        f"unsupported bmp: bpp={bpp} compression={compression}")
            nch = bpp // 8
            stride = (width * nch + 3) & ~3  # rows padded to 4 bytes
            rows = np.frombuffer(
                b, dtype=np.uint8, count=stride * abs(height), offset=data_off
            ).reshape(abs(height), stride)[:, : width * nch]
            return (
                "bmp", "image", width, abs(height), nch, None, None,
                float(rows.astype(np.float64).mean()), None,
            )
        if b[:2] in (b"P6", b"P5"):
            # netpbm binary header: magic, whitespace/comment-separated
            # width, height, maxval, single whitespace, then raster
            pos, fields = 2, []
            while len(fields) < 3 and pos < len(b):
                while pos < len(b) and b[pos : pos + 1].isspace():
                    pos += 1
                if b[pos : pos + 1] == b"#":
                    while pos < len(b) and b[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(b) and not b[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(b[start:pos]))
            pos += 1  # the single whitespace after maxval
            width, height, _maxval = fields
            nch = 3 if b[:2] == b"P6" else 1
            px = np.frombuffer(b, dtype=np.uint8, count=width * height * nch, offset=pos)
            return (
                "ppm" if nch == 3 else "pgm", "image", width, height, nch,
                None, None, float(px.astype(np.float64).mean()), None,
            )
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image

            img = Image.open(io.BytesIO(b))
            arr = np.asarray(img, dtype=np.float64)
            return (
                (img.format or "unknown").lower(), "image", img.width, img.height,
                len(img.getbands()), None, None, float(arr.mean()), None,
            )
        except ImportError:
            return (None, None, None, None, None, None, None, None,
                    "unrecognized format and PIL not installed")
    except Exception as exc:  # corrupt payload → error row, not task death
        return (None, None, None, None, None, None, None, None, f"{type(exc).__name__}: {exc}")


def decode_real(media: DataFrame) -> DataFrame:
    """REAL media decode (no stub): Arrow-batched ``mapInPandas`` over
    (id, content), one feature row per item.

    WAV audio decodes via stdlib ``wave``; BMP and netpbm (PPM/PGM)
    images via header parsing + numpy — all genuinely executable in
    this container and unit-tested against synthesized payloads.
    Compressed formats (PNG/JPEG/MP3/MP4) route to PIL/libav when
    installed and otherwise produce typed error rows; the batch
    plumbing is identical either way.
    """

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(_id), *_decode_one(content))
                for _id, content in zip(pdf["id"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "format", "kind", "width", "height", "n_channels",
                    "n_samples", "sample_rate", "mean_value", "error",
                ],
            )

    return media.select("id", "content").mapInPandas(kernel, DECODE_SCHEMA)


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
