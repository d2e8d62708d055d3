"""Multimodal pipeline queries (north star: binary columns + typed
metadata + Arrow-batched feature extraction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.operators.multimodal import attach_binary_payload, decode_features
from cobradb_spark.registry import register

# feat_i = byte i of sha256(payload) / 255 — reproducible in SQL because
# sha256(utf8 bytes of text) == sha256(text) in both engines.
_FEAT_DUCK = ", ".join(
    f"round(CAST(concat('0x', substr(sha256(text), {2 * i + 1}, 2)) AS INTEGER) / 255.0, 6)"
    f" AS feat_{i}"
    for i in range(4)
)


@register(
    "multimodal_decode",
    oracle=f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
       sha256(text) AS content_hash,
       {_FEAT_DUCK}
FROM documents
""",
    doc="Multimodal ingest + decode: text promoted to binary payload + metadata "
    "struct (operators/multimodal.py), features via Arrow-batched mapInPandas "
    "('fake' sha256 codec — real image/audio codecs are NotImplemented stubs, "
    "container has no libs; plumbing is identical). ASCII text => n_bytes == "
    "length(text), and the sha256-derived features are SQL-reproducible, so "
    "this UDF path gets a full hash oracle.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d)
    feats = decode_features(with_payload, id_col="doc_id", codec="fake")
    meta = with_payload.select("doc_id", F.col("meta.content_hash").alias("content_hash"))
    out = feats.join(meta, feats.id == meta.doc_id).select(
        "doc_id",
        "n_bytes",
        "content_hash",
        *[F.round(F.element_at("feat", i + 1), 6).alias(f"feat_{i}") for i in range(4)],
    )
    return out


@register(
    "multimodal_frame_sample",
    oracle="""
WITH frames AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS frame_no
  FROM documents
), sampled AS (
  SELECT d.doc_id, f.frame_no,
         substr(d.text, CAST(f.frame_no * 64 + 1 AS BIGINT), 64) AS frame
  FROM frames f JOIN documents d ON d.doc_id = f.doc_id
  WHERE f.frame_no % 4 = 0
)
SELECT doc_id, frame_no,
       CAST(length(frame) AS BIGINT) AS frame_bytes,
       CAST(CAST(concat('0x', substr(md5(frame), 1, 15)) AS UBIGINT) AS BIGINT) AS frame_sig
FROM sampled
""",
    doc="Multimodal frame sampling: the payload is treated as fixed-size "
    "64-byte frames; every 4th frame is extracted (sequence + explode + "
    "substring — all JVM codegen, the same plumbing a video pipeline uses "
    "before handing sampled frames to a codec UDF) and fingerprinted. "
    "ASCII text makes byte slicing SQL-reproducible, so the whole "
    "frame-extraction path gets a hash oracle; a real ffmpeg codec slots "
    "in at the frame boundary as a mapInPandas stage "
    "(operators/multimodal.py stubs it, container has no codec libs). "
    "Scale: explode multiplies rows ~N/256 per doc BEFORE any shuffle — "
    "frame work stays partition-local.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / 64.0).cast("long")
    frames = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    ).filter(F.col("frame_no") % 4 == 0)
    frame = F.substring(F.col("text"), (F.col("frame_no") * 64 + 1).cast("int"), 64)
    sig = F.conv(F.substring(F.md5(frame), 1, 15), 16, 10).cast("long")
    return frames.select(
        "doc_id",
        "frame_no",
        F.length(frame).cast("long").alias("frame_bytes"),
        sig.alias("frame_sig"),
    )
