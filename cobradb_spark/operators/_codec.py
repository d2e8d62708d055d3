"""Shared plumbing for the pure-python codecs (jpeg / png / gif).

Two contracts every codec must keep live here so they cannot drift
apart per format (round-5 review):

- `wrap_codec_errors`: malformed input ALWAYS surfaces as ValueError —
  one classifiable record error per bad blob in a batch, never a raw
  IndexError/KeyError/zlib.error from parser internals (fuzz-tested per
  codec in tests/test_sources.py);
- `decode_image_features`: the Arrow-batched mapInPandas stage that
  turns (id, payload) rows into per-channel integer sums, identical for
  every image codec — one place to fix schema/overflow/ordering.
"""

from __future__ import annotations

import functools
import struct
from collections.abc import Callable

from pyspark.sql import DataFrame


def wrap_codec_errors(fmt: str, extra: tuple[type[BaseException], ...] = ()):
    """Decorator: re-raise a decoder's low-level parse failures as
    ValueError with the format named; genuine ValueErrors pass through."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def inner(data: bytes):
            try:
                return fn(data)
            except ValueError:
                raise
            # MemoryError deliberately NOT wrapped: a decompression bomb
            # or genuine executor memory pressure must surface as a
            # resource failure, not be misclassified as per-record
            # corruption (advisor r5).
            except (IndexError, KeyError, OverflowError, struct.error, *extra) as e:
                raise ValueError(f"corrupt {fmt} stream: {type(e).__name__}: {e}") from e

        return inner

    return deco


def decode_image_features(df: DataFrame, decode_fn: Callable) -> DataFrame:
    """Shared (id, payload) -> (id, width, height, r_sum, g_sum, b_sum)
    mapInPandas stage over any `bytes -> (h, w, 3) uint8` decoder."""
    import numpy as np
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            out = {"id": [], "width": [], "height": [], "r_sum": [], "g_sum": [], "b_sum": []}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                rgb = decode_fn(bytes(payload))
                out["id"].append(i)
                out["height"].append(rgb.shape[0])
                out["width"].append(rgb.shape[1])
                out["r_sum"].append(int(rgb[:, :, 0].astype(np.int64).sum()))
                out["g_sum"].append(int(rgb[:, :, 1].astype(np.int64).sum()))
                out["b_sum"].append(int(rgb[:, :, 2].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return df.select("id", "payload").mapInPandas(
        dec,
        schema="id long, width long, height long, r_sum long, g_sum long, b_sum long",
    )
