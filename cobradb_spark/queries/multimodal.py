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
