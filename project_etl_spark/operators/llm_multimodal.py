"""§2.11 [EXT] Multimodal columns.

Pattern: media (image/audio/video) ride as opaque ``binary`` columns with a
typed metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.

The decode libraries (PIL/ffmpeg/etc.) are not in this container, so the
codec step is a deterministic STUB (``fake_image_decode``) — the Spark-side
plumbing (schema, batch iteration, partitioning, UDF signatures) is real and
tested; swap the stub for a real codec in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_etl_spark.io import table
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

# Typed metadata carried next to every media payload.
MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),
])


@register(
    "ext_multimodal_struct",
    oracle="""
        SELECT d.doc_id,
               d.lang,
               d.n_chars,
               octet_length(encode(d.text)) AS payload_bytes,
               md5(d.text) AS checksum,
               CAST(len(e.embedding) AS INT) AS emb_dim,
               e.label
        FROM documents d
        JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    tags=("ext", "multimodal"),
)
def ext_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: binary payload (+byte length), typed
    metadata struct, and the embedding — built as nested structs, then
    projected back out (struct field access is hash-checked via the
    flattened columns)."""
    ensure_deterministic(spark)
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    bundled = (
        d.join(e, d["doc_id"] == e["vec_id"])
        .select(
            "doc_id", "lang", "n_chars", "label", "embedding",
            F.struct(
                F.lit("text/plain").alias("media_type"),
                F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
                F.md5("text").alias("checksum"),
            ).alias("meta"),
        )
    )
    return bundled.select(
        "doc_id", "lang", "n_chars",
        F.col("meta.n_bytes").alias("payload_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.size("embedding").alias("emb_dim"),
        "label",
    )


def fake_image_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image codec (real codecs unavailable in
    this container). Derives fake (width, height, n_frames) from the bytes.

    Production: replace the body with e.g. PIL.Image.open(io.BytesIO(blob));
    the Spark-side contract (bytes in, typed dict out) is unchanged.
    """
    if not blob:
        raise NotImplementedError("empty payload: nothing to decode")
    return {
        "width": 16 + blob[0] % 64,
        "height": 16 + blob[-1] % 64,
        "n_frames": 1 + len(blob) % 8,
    }


DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Arrow-batched media decode over ``mapInPandas``: each batch of binary
    payloads is decoded in one Python round-trip. This is the template for
    image resize / audio feature-extraction / video frame-sampling at scale:
    partition on the id, bound batch memory with
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    from project_etl_spark.session import _ship_package
    _ship_package(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [fake_image_decode(b) for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": [m["width"] for m in meta],
                "height": [m["height"] for m in meta],
                "n_frames": [m["n_frames"] for m in meta],
                "n_bytes": [len(b) for b in pdf[payload_col]],
            })

    return df.mapInPandas(run, DECODED_SCHEMA)


@register(
    "ext_frame_sample",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   text,
                   CAST(ceil(length(text) / 32e0) AS INT) AS n_frames
            FROM documents
            WHERE length(text) > 0
        ),
        idx AS (
            SELECT doc_id, text,
                   unnest(range(0, n_frames, 4)) AS frame_no
            FROM f
        )
        SELECT doc_id,
               CAST(frame_no AS INT) AS frame_no,
               md5(substring(text, CAST(frame_no * 32 + 1 AS INT), 32))
                   AS frame_md5,
               CAST(length(substring(text, CAST(frame_no * 32 + 1 AS INT), 32))
                    AS INT) AS frame_len
        FROM idx
    """,
    tags=("ext", "multimodal", "sampling"),
)
def ext_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as byte-range reads: fixed 32-byte frames over the
    payload, keep every 4th — compute the sampled offsets row-locally
    (``sequence``), then slice ONLY those ranges. This is the shape that
    matters at 100 TB video: the sampled offsets are known before any
    decode, so a smart reader fetches k/4 of the bytes instead of
    materializing every frame and filtering. The fixture payload is the
    ASCII text column (1 byte/char), which keeps the slice+md5 algebra
    identical in both engines; on real media the same expressions run on
    the ``binary`` column (Spark's substring/md5 accept binary)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    nf = F.ceil(F.length("text") / F.lit(32)).cast("int")
    # empty payload -> zero frames (Spark's sequence would reject 0..-1)
    frames = (docs.where(F.length("text") > 0)
              .withColumn("n_frames", nf)
              .select("doc_id", "text",
                      F.explode(F.sequence(
                          F.lit(0), F.col("n_frames") - 1, F.lit(4)))
                      .alias("frame_no")))
    frame = F.expr("substring(text, frame_no * 32 + 1, 32)")
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.md5(frame).alias("frame_md5"),
        F.length(frame).cast("int").alias("frame_len"),
    )


@register("ext_multimodal_decode", oracle=None, tags=("ext", "multimodal"))
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: text -> binary payload (stand-in for
    image bytes) -> Arrow-batched stub decode -> typed metadata rows.
    Rows-only check (the stub is Python-side); the plumbing is the product."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_media(with_payload)
