"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Engine-roadmap surface for a 100 TB training-data pipeline. The Spark-side
plumbing is real and tested — schema, partitioning, Arrow batch shape,
``mapInPandas`` signatures; only the media *decode* kernels are stubbed
(the codec libraries are not in this container) behind
``DETERMINISTIC_FAKE_DECODE``: a reproducible fake that derives "pixels" /
"samples" from the bytes, or ``NotImplementedError`` when disabled.

Design notes for scale:

- media rows are large (MBs) — keep ``spark.sql.files.maxPartitionBytes``
  the bound on scan partitions and NEVER collect binaries to the driver.
- decode/feature-extract runs as ``mapInPandas`` (Arrow batches, one Python
  worker per core); batch size bounded by ``maxRecordsPerBatch`` so a batch
  of decoded frames fits executor memory.
- derived features (embeddings, thumbnails) are small — project early, so
  the heavy binary column is dropped before any shuffle.
- every closure shipped to Python workers is SELF-CONTAINED (locals +
  stdlib/pandas imported inside): no reference to this package, so workers
  need nothing beyond pyspark+pandas on their path.
"""

from __future__ import annotations

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

# Flip to False to surface NotImplementedError where real codecs are needed.
DETERMINISTIC_FAKE_DECODE = True

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("width", IntegerType()),     # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", IntegerType()),   # 0..255
        StructField("phash64", LongType()),        # perceptual-hash stand-in
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow-batched).

    The binary column enters the Python worker in Arrow batches and is
    DROPPED in the returned frame — only small features leave, so any
    downstream shuffle moves features, not media bytes.
    """
    fake = DETERMINISTIC_FAKE_DECODE  # captured by value — closure stays self-contained

    def batches(it):
        import hashlib

        import pandas as pd

        def decode(payload: bytes):
            # Deterministic stand-in for an image decode. Replace with
            # PIL/libvips in production.
            if not fake:
                raise NotImplementedError("image codec not available in this container")
            d = hashlib.sha256(payload).digest()
            return (
                64 + d[0] % 192,
                64 + d[1] % 192,
                d[2],
                int.from_bytes(d[3:11], "big", signed=True),
            )

        for pdf in it:
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                    "phash64": [d[3] for d in decoded],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(batches, IMAGE_FEATURES_SCHEMA)
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media schema (payload = the UTF-8
    bytes of the text) — a deterministic binary column for exercising the
    full multimodal path against real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/x-fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked multimodal query: binary payload -> mapInPandas decode
    (Arrow batches through a Python worker) -> small typed features. The
    deterministic fake decode is sha256-derived, which the DuckDB oracle
    reproduces byte-for-byte from the hex digest — so the whole
    Python-worker path is value-checked, not just smoke-tested."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    # spread the single-file scan so the Python decode workers run on all
    # cores (mapInPandas sits above the exchange, so a bare repartition is
    # enough here — no pushdown hazard)
    par = spark.sparkContext.defaultParallelism
    media = media_from_documents(docs.repartition(par))
    return extract_image_features(media).select(
        "media_id", "width", "height", "mean_luma"
    )


# byte i (1-based) of the hex sha256 digest, as an integer expression
_HEXB = (
    "((strpos('0123456789abcdef', substr(hx, {o1}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(hx, {o2}, 1)) - 1))"
)


def _hex_byte(i: int) -> str:
    return _HEXB.format(o1=2 * i - 1, o2=2 * i)


ORACLE_MEDIA_FEATURES = f"""
WITH h AS (
  SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
)
SELECT media_id,
       CAST(64 + {_hex_byte(1)} % 192 AS INTEGER) AS width,
       CAST(64 + {_hex_byte(2)} % 192 AS INTEGER) AS height,
       CAST({_hex_byte(3)} AS INTEGER) AS mean_luma
FROM h
"""


def resize_stub(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: passes bytes through the Arrow boundary and returns a
    (fake) resized payload + new dims. Shape/typing is what production needs;
    the kernel is the stub."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    fake = DETERMINISTIC_FAKE_DECODE

    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            ws, hs, payloads = [], [], []
            for p in pdf["payload"]:
                if not fake:
                    raise NotImplementedError("image codec not available")
                d = hashlib.sha256(p).digest()
                w, h = 64 + d[0] % 192, 64 + d[1] % 192
                scale = min(1.0, max_side / max(w, h))
                ws.append(int(w * scale))
                hs.append(int(h * scale))
                payloads.append(bytes(p[: max(1, len(p) // 2)]))  # fake downscale
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads,
                 "width": ws, "height": hs}
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(batches, out_schema)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio decode plumbing: payload -> (duration, rms stub). Duration is
    real arithmetic on the byte length and sample-rate metadata (16-bit
    mono assumption); the rms is the deterministic fake standing in for a
    real codec."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("duration_s", IntegerType()),
            StructField("rms", IntegerType()),
        ]
    )
    fake = DETERMINISTIC_FAKE_DECODE

    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            ids, durs, rmss = [], [], []
            for mid, p, sr in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"]
            ):
                if not fake:
                    raise NotImplementedError("audio codec not available")
                rate = int(sr) if pd.notna(sr) and sr else 16000
                n_samples = len(bytes(p)) // 2
                ids.append(mid)
                durs.append(n_samples // rate)
                rmss.append(hashlib.sha256(bytes(p)).digest()[0])
            yield pd.DataFrame(
                {"media_id": ids, "duration_s": durs, "rms": rmss}
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "sample_rate"
    ).mapInPandas(batches, out_schema)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled frame
    (explode semantics through mapInPandas)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_phash64", LongType()),
        ]
    )
    fake = DETERMINISTIC_FAKE_DECODE

    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            ids, idxs, hashes = [], [], []
            for mid, p, nf in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                if not fake:
                    raise NotImplementedError("video codec not available")
                n = int(nf) if pd.notna(nf) else 0
                for fi in range(0, n, every_n):
                    d = hashlib.sha256(bytes(p) + fi.to_bytes(4, "big")).digest()
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(int.from_bytes(d[:8], "big", signed=True))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_phash64": hashes}
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "n_frames"
    ).mapInPandas(batches, out_schema)
