"""Multimodal column operators: opaque binary payloads + typed metadata.

The 100 TB pattern (BASELINE.json north star): image/audio/video live as
`binary` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
mapInPandas, so each task streams batches without materializing blobs
on the driver.

The real codec libraries (PIL / librosa / ffmpeg) are NOT in this
container, so `decode_features(codec=...)` supports:
  - "fake": deterministic sha256-derived features — the full Spark
    plumbing (schema, batching, partitioning) is real and oracle-checked;
  - "image"/"audio"/"video": clearly-marked NotImplementedError stubs
    where the codec call would go.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

_REAL_CODECS = {
    "image": "PIL.Image.open + resize/normalize",
    "audio": "librosa.load + mel-spectrogram",
    "video": "ffmpeg frame sampling",
}


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Promote a text column to the multimodal shape: binary payload +
    metadata struct (byte length, content hash, declared mime)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("content_hash"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def decode_features(df: DataFrame, id_col: str, codec: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Output: (id, n_bytes, feat array<double> of FEATURE_DIM).  Batches
    arrive as Arrow record batches; nothing is collected driver-side.
    """
    if codec in _REAL_CODECS:
        raise NotImplementedError(
            f"codec {codec!r} ({_REAL_CODECS[codec]}) requires libraries not in "
            "this container; the 'fake' codec exercises the identical Spark "
            "plumbing (schema, Arrow batching, partitioning)."
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def extract(batches):
        for pdf in batches:
            feats = [
                [int(h[2 * i : 2 * i + 2], 16) / 255.0 for i in range(FEATURE_DIM)]
                for h in (hashlib.sha256(p).hexdigest() for p in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feat": feats,
                }
            )

    return df.select(F.col(id_col).alias(id_col), "payload").mapInPandas(
        extract, schema=f"id long, n_bytes long, feat array<double>"
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: the codec step is NotImplemented in this
    container; the surrounding plan (filter on frame index metadata) is
    the real one."""
    raise NotImplementedError(
        "frame_sample requires a video codec (ffmpeg) not present in this "
        "container; at deploy time this becomes mapInPandas over payload "
        f"yielding every {every_n}th decoded frame."
    )
