"""Connector contract tests for the custom Python DataSources
(sources/pydocs.py, pysink.py, pyevents_stream.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _docs_df(spark, sf_dir):
    from cobradb_spark.session import apply_runtime_confs
    from cobradb_spark.sources.pydocs import DocsParquetDataSource

    apply_runtime_confs(spark)
    spark.dataSource.register(DocsParquetDataSource)
    return (
        spark.read.format("cobradb_pydocs")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
    )


def test_pydocs_declined_filter_still_correct(spark, sf_dir):
    """pushFilters only absorbs equality; a range predicate is declined and
    Spark must evaluate it post-scan — same answer as the native reader."""
    got = _docs_df(spark, sf_dir).filter(F.col("n_chars") > 300).count()
    want = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("n_chars") > 300)
        .count()
    )
    assert got == want and got > 0


def test_pydocs_combined_pushed_and_declined(spark, sf_dir):
    """Equality (pushed) + range (declined) together stay exact."""
    cond = (F.col("lang") == "en") & (F.col("n_chars") > 300)
    got = _docs_df(spark, sf_dir).filter(cond).count()
    want = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(cond).count()
    assert got == want


def test_pysink_manifest_lists_exactly_committed_parts(spark, sf_dir, tmp_path):
    """Two-phase commit: every part in the directory is in the manifest
    (no torn/unreferenced data after a successful commit) and the
    read-back row count matches what was written."""
    from cobradb_spark.sources.pysink import JsonlSinkDataSource, read_manifested_jsonl

    spark.dataSource.register(JsonlSinkDataSource)
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_jsonl")
    src.write.format("cobradb_pyjsonl").option("path", path).mode("append").save()

    manifest = open(os.path.join(path, "_MANIFEST")).read().split()
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert sorted(manifest) == sorted(parts)
    back = read_manifested_jsonl(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert back.count() == src.count()


def test_events_ts_tripwire_signatures(spark):
    """The load-time sanity gate fires on unit-error SIGNATURES (epoch
    collapse / absurd future / ~1000x span inflation) but passes a
    legitimate single-day dataset (round-3 ADVICE: the old 1-day span
    floor rejected those)."""
    import datetime as dt

    import pytest

    from cobradb_spark import io as cio

    def frame(lo, hi):
        return spark.createDataFrame(
            [(1, lo), (2, hi)], "event_id long, ts timestamp_ntz"
        )

    # legitimate single-day span: must PASS now
    cio._assert_events_ts_sane(
        frame(dt.datetime(2024, 5, 1, 9), dt.datetime(2024, 5, 1, 17)), "/tmp/ok1"
    )
    # epoch collapse (us read as ns divides by 1000 -> everything ~1970)
    with pytest.raises(ValueError, match="implausible"):
        cio._assert_events_ts_sane(
            frame(dt.datetime(1970, 1, 1), dt.datetime(1970, 1, 31)), "/tmp/bad1"
        )
    # absurd future (ns read as us multiplies by 1000)
    with pytest.raises(ValueError, match="implausible"):
        cio._assert_events_ts_sane(
            frame(dt.datetime(3500, 1, 1), dt.datetime(3500, 2, 1)), "/tmp/bad2"
        )
    # ~1000x span inflation
    with pytest.raises(ValueError, match="implausible"):
        cio._assert_events_ts_sane(
            frame(dt.datetime(1990, 1, 1), dt.datetime(2080, 1, 1)), "/tmp/bad3"
        )


def test_table_schema_tripwire(spark, tmp_path):
    """documents/embeddings footer-schema drift is rejected at load."""
    import pytest

    from cobradb_spark import io as cio

    bad_docs = spark.createDataFrame(
        [(1, 2, "en", "s", 1)],
        "doc_id long, text long, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="documents.text"):
        cio._assert_table_schema_sane(bad_docs, str(tmp_path), "documents")
    bad_emb = spark.createDataFrame(
        [(1, "x", 0)], "vec_id long, embedding string, label int"
    )
    with pytest.raises(ValueError, match="embeddings.embedding"):
        cio._assert_table_schema_sane(bad_emb, str(tmp_path), "embeddings")
    missing = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="missing columns"):
        cio._assert_table_schema_sane(missing, str(tmp_path), "documents")


def test_jpeg_codec_blockconstant_bitexact():
    """DC-only content (block-constant, even values, DC step 16) must
    survive the full lossy pipeline bit-exactly — the property the
    multimodal_jpeg_decode oracle depends on."""
    import numpy as np

    from cobradb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    img = np.zeros((24, 16, 3), dtype=np.uint8)
    for by in range(0, 24, 8):
        for bx in range(0, 16, 8):
            img[by : by + 8, bx : bx + 8, 0] = int(rng.integers(14, 114)) * 2
    img[:, :, 1] = 128
    img[:, :, 2] = 128
    rgb = decode_jpeg(encode_jpeg(img, dc_step=16, ac_step=16))
    y = img[:, :, 0]
    assert (rgb[:, :, 0] == y).all() and (rgb[:, :, 1] == y).all() and (rgb[:, :, 2] == y).all()


def test_jpeg_codec_general_content_tolerance():
    """Arbitrary content through encode->decode stays within a lossy
    tolerance (exercises AC runs, ZRL, magnitude categories, Huffman
    paths the bit-exact fixture never hits)."""
    import numpy as np

    from cobradb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(2)
    img = np.zeros((32, 40, 3), dtype=np.uint8)
    img[:, :, 0] = rng.integers(0, 256, size=(32, 40))
    img[:, :, 1] = 128
    img[:, :, 2] = 128
    out = decode_jpeg(encode_jpeg(img, dc_step=8, ac_step=8))
    mae = np.abs(out[:, :, 0].astype(float) - img[:, :, 0].astype(float)).mean()
    assert mae < 4.0
    # smooth gradient compresses near-losslessly at step 8
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(16, dtype=np.uint8)[None, :] * 8 + 32
    grad[:, :, 1] = 128
    grad[:, :, 2] = 128
    out2 = decode_jpeg(encode_jpeg(grad, dc_step=8, ac_step=8))
    assert np.abs(out2[:, :, 0].astype(float) - grad[:, :, 0].astype(float)).max() <= 8


def test_jpeg_decoder_rejects_unsupported():
    import pytest

    from cobradb_spark.operators.jpeg import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_png_codec_lossless_all_filters():
    """Roundtrip must be bit-exact on odd shapes (every filter type in
    the y%5 cycle, partial final pixels) and the decoder must handle
    greyscale and RGBA variants."""
    import struct
    import zlib

    import numpy as np

    from cobradb_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(16, 16, 3), (7, 13, 3), (9, 32, 3)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        assert (decode_png(encode_png(img)) == img).all(), shape

    def chunk(t, b):
        c = t + b
        return struct.pack(">I", len(b)) + c + struct.pack(">I", zlib.crc32(c))

    g = rng.integers(0, 256, size=(5, 6)).astype(np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(5))
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(data)
    assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()

    import pytest

    with pytest.raises(ValueError):
        decode_png(b"not a png at all----")
    # corrupt a CRC byte
    bad = bytearray(encode_png(g[:4, :4][..., None].repeat(3, axis=2)))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_jpeg_restart_markers():
    """DRI/RSTn layout (what real encoders default to) must decode to the
    identical pixels as the marker-free layout — byte alignment, RSTn
    consumption, and DC-prediction reset all exercised."""
    import numpy as np

    from cobradb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = np.zeros((32, 24, 3), dtype=np.uint8)
    img[:, :, 0] = rng.integers(0, 256, size=(32, 24))
    img[:, :, 1] = 128
    img[:, :, 2] = 128
    base = decode_jpeg(encode_jpeg(img, dc_step=8, ac_step=8))
    for ri in (1, 2, 5):
        out = decode_jpeg(encode_jpeg(img, dc_step=8, ac_step=8, restart_interval=ri))
        assert (out == base).all(), ri


def test_jpeg_category_magnitude_roundtrip():
    """Huffman category/magnitude encoding must invert exactly over the
    full baseline coefficient range (the encoder/decoder pair the
    bit-exact fixture only exercises at small magnitudes)."""
    from cobradb_spark.operators.jpeg import _category, _extend, _magnitude_bits

    for v in range(-2047, 2048):
        s = _category(v)
        if v == 0:
            assert s == 0
            continue
        assert 1 <= s <= 11
        assert _extend(_magnitude_bits(v, s), s) == v


def test_codecs_fail_clean_on_corrupt_input():
    """Truncated/corrupted/header-stripped payloads must always raise
    ValueError — never a raw IndexError/KeyError/zlib.error — so one bad
    blob in a 100 TB batch is a classifiable record error, not a random
    internal crash (seeded fuzz, 200 mutations per codec)."""
    import random

    import numpy as np

    from cobradb_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from cobradb_spark.operators.png import decode_png, encode_png

    rng = random.Random(7)
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :, 0] = 77
    img[:, :, 1] = 128
    img[:, :, 2] = 128
    for data, dec in ((encode_jpeg(img), decode_jpeg), (encode_png(img), decode_png)):
        for _ in range(200):
            b = bytearray(data)
            op = rng.random()
            if op < 0.4:
                b = b[: rng.randrange(1, len(b))]
            elif op < 0.8:
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b = b[rng.randrange(1, 10):]
            try:
                dec(bytes(b))
            except ValueError:
                pass  # the only acceptable failure mode


def test_gif_codec_lossless_and_clean_errors():
    """Real-LZW GIF roundtrips bit-exactly (odd shapes, palette sizes,
    dictionary saturation via a large repetitive raster) and corrupt
    input only ever raises ValueError."""
    import random

    import numpy as np
    import pytest

    from cobradb_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(0)
    for shape, ncol in [((16, 16), 64), ((7, 13), 5), ((40, 33), 256)]:
        pal = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
        idx = rng.integers(0, ncol, size=shape).astype(np.uint8)
        assert (decode_gif(encode_gif(idx, pal)) == pal[idx.astype(int)]).all()
    idx = (np.arange(128 * 128) % 7).reshape(128, 128).astype(np.uint8)
    pal = rng.integers(0, 256, size=(7, 3)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx.astype(int)]).all()

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF-------")
    r = random.Random(3)
    data = encode_gif(idx[:16, :16], pal)
    for _ in range(150):
        b = bytearray(data)
        if r.random() < 0.5:
            b = b[: r.randrange(1, len(b))]
        else:
            for _ in range(r.randrange(1, 4)):
                b[r.randrange(len(b))] = r.randrange(256)
        try:
            decode_gif(bytes(b))
        except ValueError:
            pass


def test_flac_codec_lossless_and_clean_errors():
    """FLAC-subset roundtrips bit-exactly across content classes (noise,
    ramps, constants, sine — exercising CONSTANT/VERBATIM/FIXED subframe
    selection), actually compresses predictable content, and corrupt
    input only ever raises ValueError (CRC-8/CRC-16/MD5 guards)."""
    import random

    import numpy as np
    import pytest

    from cobradb_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(-32768, 32768, 900),           # noise -> VERBATIM-ish
        (np.arange(700) * 13 - 5000) % 65536 - 32768,  # ramp -> FIXED order 1+
        np.full(513, -12345),                        # CONSTANT subframe
        (3000 * np.sin(np.arange(4096) / 5)).astype(np.int64),
        np.array([42]),                              # single-sample clip
        rng.integers(-5, 5, 256),                    # exactly one block
    ]
    for s in cases:
        dec, rate = decode_flac(encode_flac(s, 8000))
        assert rate == 8000
        assert (dec == s).all()

    # compression: the smooth signal must beat raw PCM by a clear margin
    smooth = (3000 * np.sin(np.arange(4096) / 5)).astype(np.int64)
    assert len(encode_flac(smooth)) < 2 * len(smooth) * 0.6

    with pytest.raises(ValueError):
        decode_flac(b"NOTFLAC-------")
    r = random.Random(5)
    data = encode_flac((np.arange(800) * 7) % 65536 - 32768)
    clean = decode_flac(data)[0]
    for _ in range(200):
        b = bytearray(data)
        if r.random() < 0.5:
            b = b[: r.randrange(1, len(b))]
        else:
            for _ in range(r.randrange(1, 4)):
                b[r.randrange(len(b))] = r.randrange(256)
        try:
            out, _ = decode_flac(bytes(b))
            # undetected mutations must still decode to the exact samples
            # (flips in non-audio STREAMINFO fields like min/max framesize)
            assert (out == clean).all()
        except ValueError:
            pass


def test_timetravel_snapshots_isolate_the_rewrite(spark, sf_dir):
    """v1 must include ALL of batch A; v2 only A's >=5000-cent rows —
    i.e. a reader pinned at v1 is unaffected by commit 2's rewrite."""
    from pyspark.sql import functions as F

    from cobradb_spark.io import load_table
    from cobradb_spark.registry import get_query

    got = {
        (r["version"], r["event_type"]): (r["n_rows"], r["sum_cents"])
        for r in get_query("scan_timetravel_log").fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("c"),
    )
    v1 = ev.filter(F.col("event_id") % 3 <= 1)
    v2 = ev.filter(
        (F.col("event_id") % 3 == 1)
        | ((F.col("event_id") % 3 == 0) & (F.col("c") >= 5000))
    )
    for version, df in ((1, v1), (2, v2)):
        expect = {
            r["event_type"]: (r["n"], r["s"])
            for r in df.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("c").alias("s"))
            .collect()
        }
        assert {t: v for (ver, t), v in got.items() if ver == version} == expect
    # the rewrite dropped something at v2 (non-degenerate delete)
    n1 = sum(v[0] for (ver, _), v in got.items() if ver == 1)
    n2 = sum(v[0] for (ver, _), v in got.items() if ver == 2)
    assert n2 < n1


def test_mp3_index_walk_and_clean_errors():
    """MP3 frame indexer: (a) a pure-Python replay of the synthesis
    schedule predicts every index field (pins the header arithmetic);
    (b) payload-byte mutations never change the index (headers are the
    only bytes a header-level pass may read); (c) truncation and header
    corruption only ever raise ValueError; (d) non-MPEG1/LayerIII and
    bad-table headers are rejected with typed messages."""
    import random

    import pytest

    from cobradb_spark.operators.mp3 import (
        BITRATE_KBPS,
        SAMPLE_RATE,
        encode_mp3,
        frame_length,
        index_mp3,
    )

    for did in (0, 1, 2, 3, 4, 17, 255, 9999):
        ix = index_mp3(encode_mp3(did))
        n = 8 + did % 8
        sr = SAMPLE_RATE[did % 3]
        kbps = [BITRATE_KBPS[1 + (did * 7 + i * 13) % 14] for i in range(n)]
        pads = [(did + i) % 2 for i in range(n)]
        id3 = 10 + 32 + did % 64 if did % 4 == 0 else 0
        assert ix["n_frames"] == n
        assert ix["sample_rate"] == sr
        assert ix["duration_us"] == n * 1152 * 1_000_000 // sr
        assert ix["bitrate_sum_kbps"] == sum(kbps)
        assert ix["n_bitrates"] == len(set(kbps))
        assert ix["id3_bytes"] == id3
        assert ix["audio_bytes"] == sum(
            frame_length(1 + (did * 7 + i * 13) % 14, did % 3, pads[i])
            for i in range(n)
        )

    rng = random.Random(11)
    base = encode_mp3(42)
    ref = index_mp3(base)
    for _ in range(200):
        b = bytearray(base)
        if rng.random() < 0.5:
            b = b[: rng.randrange(1, len(b))]
        else:
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            assert index_mp3(bytes(b)) is not None
        except ValueError:
            pass
    # payload-only mutation: index must be IDENTICAL (never silently drift)
    for _ in range(50):
        b = bytearray(encode_mp3(42))
        # doc 42 has no ID3 tag; its first frame is 32 kbps @ 44100, pad 0
        # -> 104 bytes, payload bytes [4, 104)
        pos = 4 + rng.randrange(100)
        b[pos] ^= 0xFF
        assert index_mp3(bytes(b)) == ref

    with pytest.raises(ValueError, match="no frames"):
        index_mp3(b"")
    with pytest.raises(ValueError, match="lost sync"):
        index_mp3(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="not MPEG-1"):
        index_mp3(bytes((0xFF, 0xE2, 0x92, 0xC4)))  # version=00 (MPEG-2.5)
    with pytest.raises(ValueError, match="not Layer III"):
        index_mp3(bytes((0xFF, 0xFD, 0x92, 0xC4)))  # layer bits 10 = Layer II
    with pytest.raises(ValueError, match="bitrate index"):
        index_mp3(bytes((0xFF, 0xFB, 0xF2, 0xC4)))  # bitrate idx 15
    with pytest.raises(ValueError, match="reserved sample-rate"):
        index_mp3(bytes((0xFF, 0xFB, 0x9C, 0xC4)))  # sr idx 3


def test_vacuum_retention_statuses(spark, sf_dir):
    """Vacuum rule: only files unreferenced by EVERY retained snapshot are
    proposed; the file dropped-from-current-but-held-by-v3 (A2) must be
    'retained-history' (the case a naive not-in-current vacuum corrupts),
    and the integrity verdict from real post-vacuum re-reads holds."""
    from cobradb_spark import registry

    out = {r.file_label: r for r in
           registry.get_query("etl_vacuum_retention").fn(spark, sf_dir).collect()}
    assert {l: r.status for l, r in out.items()} == {
        "A": "vacuum", "B": "active", "A2": "retained-history",
        "C": "active", "A3": "active",
    }
    assert all(r.retained_reads_intact for r in out.values())
    assert out["A"].n_rows >= out["A2"].n_rows >= out["A3"].n_rows


def test_srt_parser_general_and_clean_errors():
    """The SRT parser handles hand-written real-world shapes the
    synthesizer never emits (hour-scale timestamps, 3-line cues, CRLF,
    trailing blank blocks) and raises typed ValueError on malformed
    index/range/duration/empty inputs."""
    import pandas as pd
    import pytest

    # exercise the inner parse through a tiny fake batch runner
    from cobradb_spark.operators import multimodal as mm

    class _FakeDF:
        def __init__(self, payloads):
            self._pdf = pd.DataFrame(
                {"id": list(range(len(payloads))), "payload": payloads}
            )

        def select(self, *cols):
            return self

        def mapInPandas(self, fn, schema):
            return pd.concat(list(fn([self._pdf])), ignore_index=True)

    srt = (
        "1\n01:02:03,500 --> 01:02:05,000\nhello world\n\n"
        "2\n01:02:06,000 --> 01:02:07,250\na b c\nd e\nf\n\n"
    ).encode()
    out = mm.parse_srt_cues(_FakeDF([srt]))
    assert list(out.cue_idx) == [1, 2]
    assert list(out.start_ms) == [3723500, 3726000]
    assert list(out.end_ms) == [3725000, 3727250]
    assert list(out.n_lines) == [1, 3]
    assert list(out.n_words) == [2, 6]

    crlf = srt.replace(b"\n", b"\r\n")
    out2 = mm.parse_srt_cues(_FakeDF([crlf]))
    assert out.drop(columns="id").equals(out2.drop(columns="id"))

    for bad, msg in [
        (b"", "no cues"),
        (b"x\n00:00:00,000 --> 00:00:01,000\nhi\n\n", "bad index"),
        (b"1\n00:00:00.000 --> 00:00:01,000\nhi\n\n", "bad time range"),
        (b"1\n00:00:02,000 --> 00:00:01,000\nhi\n\n", "non-positive"),
        (b"1\n00:00:00,000 --> 00:00:01,000\n\n", "under 3 lines"),
    ]:
        with pytest.raises(ValueError, match=msg):
            mm.parse_srt_cues(_FakeDF([bad]))


def test_fixedwidth_records_are_truly_fixed(spark, sf_dir):
    """Every rendered record must be exactly 48 chars (copybook contract:
    10+10+1+12+15) before the newline — a variable-width record would
    silently corrupt positional parsing downstream."""
    from cobradb_spark import registry
    from cobradb_spark.io import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    lines = o.select(
        F.format_string(
            "%010d%010d%1s%012d%-15s",
            "o_orderkey", "o_custkey", "o_orderstatus",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"),
            "o_orderpriority",
        ).alias("v")
    )
    bad = lines.filter(F.length("v") != 48).count()
    assert bad == 0
    out = registry.get_query("scan_fixedwidth").fn(spark, sf_dir)
    assert out.count() == o.count()
    assert out.filter(F.col("o_orderpriority").endswith(" ")).count() == 0


def test_csv_hostile_roundtrip_record_count(spark, sf_dir):
    """The newline-bearing quarter of payloads must NOT inflate the
    record count (the corruption this op pins), and a naive read
    WITHOUT multiLine demonstrates why the option matters."""
    from cobradb_spark import registry

    out = registry.get_query("sink_csv_quoted_roundtrip").fn(spark, sf_dir)
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert out.count() == n_parts
    embedded_nl = out.filter(F.col("payload").contains("\nsecond line")).count()
    assert embedded_nl == out.filter("p_partkey % 4 = 3").count() > 0


def test_layer1_subband_decode_exact_and_clean_errors():
    """MPEG-1 Layer I decoder contract (operators/mp3.py): (a) the
    synthesized stream round-trips to the exact dyadic-rational subband
    samples computed independently from the schedule (the fixture's
    scalefactor indices are multiples of 3, so sf = 2^(1-k) and every
    sample is exactly representable); (b) integer decode aggregates
    match an independent schedule replay; (c) corrupt streams fail
    loudly, never silently."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.mp3 import (
        SCALEFACTOR,
        decode_layer1,
        encode_layer1,
        layer1_schedule,
    )

    for did in (0, 1, 2, 3, 5, 12, 42, 100, 257):
        out = decode_layer1(encode_layer1(did))
        sch = layer1_schedule(did)
        assert out["n_frames"] == sch["n_frames"]
        assert out["n_alloc_total"] == sch["n_frames"] * sch["n_alloc"]
        # independent replay of every sample, bit-exact float compare
        want = np.zeros((sch["n_frames"] * 12, 32))
        code_sum = num_sum = num_sq = 0
        for f in range(sch["n_frames"]):
            for sb in range(sch["n_alloc"]):
                nb = sch["nb"](sb)
                sf = SCALEFACTOR[sch["sf_idx"](sb)]
                for t in range(12):
                    c = sch["code"](f, sb, t)
                    num = 2 * c + 2 - (1 << nb)
                    code_sum += c
                    num_sum += num
                    num_sq += num * num
                    want[f * 12 + t, sb] = sf * num / ((1 << nb) - 1)
        assert out["code_sum"] == code_sum
        assert out["num_sum"] == num_sum
        assert out["num_sq_sum"] == num_sq
        assert np.array_equal(out["subband_samples"], want)  # bit-exact
        # |s| <= sf_max * 2^nb/(2^nb-1) = 2 * 4/3: the fixture emits the
        # FULL code space including the top code a conformant encoder
        # never produces (it decodes past 1.0 by the published formula —
        # same as libmad's I_sample headroom), so the bound is 8/3.
        assert np.all(np.abs(out["subband_samples"]) <= 2 * 4 / 3)

    base = encode_layer1(42)
    with pytest.raises(ValueError):
        decode_layer1(b"")
    with pytest.raises(ValueError):
        decode_layer1(b"\x00" * 16)  # no sync
    with pytest.raises(ValueError):
        decode_layer1(base[:-8])  # truncated final frame
    b = bytearray(base)
    b[1] = (b[1] & ~0b110) | 0b010  # layer bits -> Layer III
    with pytest.raises(ValueError):
        decode_layer1(bytes(b))
    b = bytearray(base)
    b[2] = (b[2] & 0x0F) | 0xF0  # forbidden bitrate index 15
    with pytest.raises(ValueError):
        decode_layer1(bytes(b))


def test_layer1_decoder_fuzz_never_crashes():
    """Mutation fuzz (the index_mp3 discipline): flip one byte anywhere
    in a valid stream, or truncate it — the decoder must either raise
    ValueError (clean rejection) or return a well-formed decode dict;
    never an IndexError/struct crash, never a hang."""
    import numpy as np
    import pytest  # noqa: F401

    from cobradb_spark.operators.mp3 import decode_layer1, encode_layer1

    base = bytearray(encode_layer1(42))
    rng = np.random.default_rng(4242)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_layer1(bytes(b))
            assert out["n_frames"] >= 1
            assert out["subband_samples"].shape[1] == 32
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    # truncations at every byte boundary of the first frame
    for cut in range(1, 64):
        try:
            decode_layer1(bytes(base[:cut]))
        except ValueError:
            pass
    # payload-bit mutations beyond the headers usually still decode
    # (samples change, structure does not) — both outcomes must occur
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer2_subband_decode_exact_and_clean_errors():
    """MPEG-1 Layer II decoder contract (operators/mp2.py): (a) the
    synthesized stream round-trips to the exact subband samples computed
    independently from the schedule (dyadic scalefactors: indices are
    multiples of 3); (b) integer decode aggregates match an independent
    schedule replay, covering grouped (3/5/9) and ungrouped quantizers,
    all four scfsi modes, and both B.2a/B.2b tables across documents;
    (c) corrupt streams fail loudly, never silently."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.mp2 import (
        _applied_sf,
        decode_layer2,
        encode_layer2,
        layer2_schedule,
    )
    from cobradb_spark.operators.mp3 import SCALEFACTOR

    tables_seen = set()
    for did in (0, 1, 2, 3, 4, 5, 11, 42, 100, 257):
        out = decode_layer2(encode_layer2(did))
        sch = layer2_schedule(did)
        tables_seen.add(sch["sblimit"])
        assert out["n_frames"] == sch["n_frames"]
        assert out["sblimit"] == sch["sblimit"]
        assert out["n_alloc_total"] == sch["n_frames"] * len(sch["alloc_sbs"])
        code_sum = num_sum = num_sq = sf_sum = scfsi_sum = 0
        want = np.zeros((sch["n_frames"] * 36, 32))
        for f in range(sch["n_frames"]):
            for sb in sch["alloc_sbs"]:
                lv = sch["levels"](sb)
                scfsi_sum += sch["scfsi"](sb)
                ap = _applied_sf(
                    sch["scfsi"](sb), *[sch["sf_t"](sb, j) for j in range(3)]
                )
                sf_sum += sum(ap)
                for gr in range(12):
                    for k in range(3):
                        v = sch["code"](f, sb, gr, k, lv)
                        num = 2 * v + 1 - lv
                        code_sum += v
                        num_sum += num
                        num_sq += num * num
                        want[f * 36 + gr * 3 + k, sb] = (
                            SCALEFACTOR[ap[gr // 4]] * num / lv
                        )
        assert out["scfsi_sum"] == scfsi_sum
        assert out["sf_idx_sum"] == sf_sum
        assert out["code_sum"] == code_sum
        assert out["num_sum"] == num_sum
        assert out["num_sq_sum"] == num_sq
        assert np.array_equal(out["subband_samples"], want)  # bit-exact
        # requantized values stay inside (-1, 1): |2v+1-L| <= L-1 < L,
        # and sf <= 2, so |s| < 2 strictly
        assert np.all(np.abs(out["subband_samples"]) < 2.0)
    assert tables_seen == {27, 30}  # both B.2a and B.2b exercised

    base = encode_layer2(42)
    with pytest.raises(ValueError):
        decode_layer2(b"")
    with pytest.raises(ValueError):
        decode_layer2(b"\x00" * 16)  # no sync
    with pytest.raises(ValueError):
        decode_layer2(base[:-8])  # truncated final frame
    b = bytearray(base)
    b[1] = (b[1] & ~0b110) | 0b110  # layer bits -> Layer I
    with pytest.raises(ValueError):
        decode_layer2(bytes(b))
    b = bytearray(base)
    b[2] = (b[2] & 0x0F) | 0xF0  # forbidden bitrate index 15
    with pytest.raises(ValueError):
        decode_layer2(bytes(b))
    b = bytearray(base)
    b[2] = (b[2] & 0x0F) | 0x10  # 32 kbps -> low-rate table B.2c/B.2d
    with pytest.raises(ValueError):
        decode_layer2(bytes(b))
    b = bytearray(base)
    b[3] = 0x04  # mode -> stereo
    with pytest.raises(ValueError):
        decode_layer2(bytes(b))


def test_layer2_decoder_fuzz_never_crashes():
    """Mutation fuzz (the index_mp3/decode_layer1 discipline): flip one
    byte anywhere in a valid stream, or truncate it — the decoder must
    either raise ValueError (clean rejection) or return a well-formed
    decode dict; never an IndexError/struct crash, never a hang."""
    import numpy as np
    import pytest  # noqa: F401

    from cobradb_spark.operators.mp2 import decode_layer2, encode_layer2

    base = bytearray(encode_layer2(42))
    rng = np.random.default_rng(2422)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_layer2(bytes(b))
            assert out["n_frames"] >= 1
            assert out["subband_samples"].shape[1] == 32
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    # truncations at every byte boundary of the first frame
    for cut in range(1, 64):
        try:
            decode_layer2(bytes(base[:cut]))
        except ValueError:
            pass
    # payload-bit mutations beyond the headers usually still decode
    # (samples change, structure does not) — both outcomes must occur
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_bmp_decode_exact_and_clean_errors():
    """BMP decoder contract (operators/bmp.py): exact pixel round-trip
    in image orientation for both bottom-up and top-down storage and
    all four row-padding phases; corrupt/unsupported files fail loudly."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.bmp import bmp_schedule, decode_bmp, encode_bmp

    orientations = set()
    for did in (0, 1, 2, 3, 5, 7, 10, 42, 100, 257):
        out = decode_bmp(encode_bmp(did))
        sch = bmp_schedule(did)
        orientations.add(sch["top_down"])
        w, h = sch["width"], sch["height"]
        y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
        want = (did + 3 * x + 7 * y + 11 * c) % 256
        assert (out["width"], out["height"]) == (w, h)
        assert out["top_down"] == int(sch["top_down"])
        assert np.array_equal(out["rgb"], want)
        assert out["top_row_sum"] == int(want[0].sum())
    assert orientations == {True, False}

    base = encode_bmp(42)
    # bogus bfSize (commonly 0 in real-world writers) must still decode:
    # the pixel-data bound, not bfSize, is the protective check (r9 ADVICE)
    b = bytearray(base)
    b[2:6] = b"\x00\x00\x00\x00"
    assert np.array_equal(decode_bmp(bytes(b))["rgb"], decode_bmp(base)["rgb"])
    with pytest.raises(ValueError):
        decode_bmp(b"")
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + base[2:])  # bad magic
    with pytest.raises(ValueError):
        decode_bmp(base[:-4])  # truncated pixel data (runs past EOF)
    b = bytearray(base)
    b[28] = 8  # bpp -> 8 (palette)
    with pytest.raises(ValueError):
        decode_bmp(bytes(b))
    b = bytearray(base)
    b[30] = 1  # compression -> RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(b))


def test_bmp_decoder_fuzz_never_crashes():
    """Mutation fuzz (the decode_layer1/2 discipline): flip one byte
    anywhere, or truncate — ValueError or a well-formed decode dict,
    never an IndexError/struct crash."""
    import numpy as np
    import pytest  # noqa: F401

    from cobradb_spark.operators.bmp import decode_bmp, encode_bmp

    base = bytearray(encode_bmp(42))
    rng = np.random.default_rng(2442)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_bmp(bytes(b))
            assert out["width"] >= 1 and out["height"] >= 1
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for cut in range(1, 64):
        try:
            decode_bmp(bytes(base[:cut]))
        except ValueError:
            pass
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_mp3_sideinfo_parse_exact_and_clean_errors():
    """Layer III side-info parser contract (operators/mp3.py): every
    field of the 136-bit mono record round-trips against an independent
    schedule replay (both switching and normal granule layouts, all
    three rates); spec-constraint violations fail loudly."""
    import pytest

    from cobradb_spark.operators.mp3 import (
        encode_mp3_sideinfo,
        mp3_sideinfo_schedule,
        parse_mp3_sideinfo,
    )

    layouts = set()
    for did in (0, 1, 2, 3, 5, 12, 42, 100, 257):
        out = parse_mp3_sideinfo(encode_mp3_sideinfo(did))
        sch = mp3_sideinfo_schedule(did)
        assert out["n_frames"] == sch["n_frames"]
        assert out["scfsi_first"] == sch["scfsi"]
        assert len(out["granules"]) == 2 * sch["n_frames"]
        for rec in out["granules"]:
            f, g = rec["frame"], rec["granule"]
            layouts.add(bool(rec["switching"]))
            assert rec["part2_3_length"] == sch["part23"](f, g)
            assert rec["big_values"] == sch["big_values"](f, g)
            assert rec["global_gain"] == sch["global_gain"](f, g)
            assert rec["scalefac_compress"] == sch["scalefac_compress"](f, g)
            assert bool(rec["switching"]) == sch["switching"](f, g)
            if rec["switching"]:
                assert rec["block_type"] == sch["block_type"](f, g)
                assert rec["mixed_block"] == sch["mixed_block"](f, g)
                assert rec["table_select"] == [
                    sch["table_select"](f, g, k) for k in range(2)
                ]
                assert rec["subblock_gain"] == [
                    sch["subblock_gain"](f, g, k) for k in range(3)
                ]
            else:
                assert rec["table_select"] == [
                    sch["table_select"](f, g, k) for k in range(3)
                ]
                assert rec["region0_count"] == sch["region0"](f, g)
                assert rec["region1_count"] == sch["region1"](f, g)
            assert rec["preflag"] == sch["preflag"](f, g)
            assert rec["scalefac_scale"] == sch["scalefac_scale"](f, g)
            assert rec["count1table_select"] == sch["count1table"](f, g)
    assert layouts == {True, False}

    base = encode_mp3_sideinfo(42)
    with pytest.raises(ValueError):
        parse_mp3_sideinfo(b"")
    with pytest.raises(ValueError):
        parse_mp3_sideinfo(b"\x00" * 32)  # no sync
    with pytest.raises(ValueError):
        parse_mp3_sideinfo(base[:-8])  # truncated final frame
    b = bytearray(base)
    b[1] = (b[1] & ~0b110) | 0b110  # layer bits -> Layer I
    with pytest.raises(ValueError):
        parse_mp3_sideinfo(bytes(b))


def test_mp3_sideinfo_fuzz_never_crashes():
    """Mutation fuzz: one flipped byte or a truncation must yield
    ValueError or a well-formed parse, never a crash."""
    import numpy as np
    import pytest  # noqa: F401

    from cobradb_spark.operators.mp3 import encode_mp3_sideinfo, parse_mp3_sideinfo

    base = bytearray(encode_mp3_sideinfo(42))
    rng = np.random.default_rng(333)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = parse_mp3_sideinfo(bytes(b))
            assert out["n_frames"] >= 1
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for cut in range(1, 64):
        try:
            parse_mp3_sideinfo(bytes(base[:cut]))
        except ValueError:
            pass
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer2_requant_rational_matches_spec_form():
    """The decoder's unified rational sample = sf*(2v+1-L)/L must equal
    the spec's s'' = C*(s''' + D) form (ISO 11172-3 2.4.3.4 with the
    Table B.4 constants: C = 2^nb/L; D = 1/2 for the grouped 3/5/9
    quantizers, D = 2^(1-nb) for ungrouped L = 2^nb-1), where
    s''' = v/2^(nb-1) - 1.  Exact-rational identity over EVERY level of
    every allocation table row and every code value (capped for the
    huge quantizers)."""
    from fractions import Fraction

    from cobradb_spark.operators.mp2 import (
        _REGION_LEVELS_2,
        _REGION_LEVELS_3,
        _REGION_LEVELS_40,
        _REGION_LEVELS_41,
        GROUP_BITS,
    )

    levels = sorted(
        set(_REGION_LEVELS_40 + _REGION_LEVELS_41 + _REGION_LEVELS_3 + _REGION_LEVELS_2)
    )
    for L in levels:
        if L in GROUP_BITS:
            nb = {3: 2, 5: 3, 9: 4}[L]
            D = Fraction(1, 2)
        else:
            nb = L.bit_length()  # L = 2^nb - 1
            assert (1 << nb) - 1 == L
            D = Fraction(1, 1 << (nb - 1))
        C = Fraction(1 << nb, L)
        vs = range(L) if L <= 1024 else list(range(64)) + [L // 2, L - 1]
        for v in vs:
            s3 = Fraction(v, 1 << (nb - 1)) - 1
            spec = C * (s3 + D)
            unified = Fraction(2 * v + 1 - L, L)
            assert spec == unified, (L, v)
        # symmetry: the code space is symmetric around zero
        assert Fraction(2 * 0 + 1 - L, L) == -Fraction(2 * (L - 1) + 1 - L, L)


def test_mp3_huffman_main_roundtrip_and_clean_errors():
    """Layer III Huffman main-data contract (operators/mp3huff.py):
    (a) decode(encode(doc)) recovers the schedule's granule records
    EXACTLY — every transmitted scalefactor, every big-value spectral
    sample with its sign, every count1 quad — across all three sample
    rates, short/long granules, scfsi frames, both count1 tables and
    zero-table regions; (b) integer aggregates match an independent
    replay; (c) spec-violating streams fail loudly."""
    import pytest

    from cobradb_spark.operators.mp3huff import (
        SFB_LONG,
        _TMAX,
        decode_mp3_main,
        encode_mp3_main,
        mp3_main_schedule,
    )

    covered = set()
    for did in (0, 1, 2, 3, 5, 7, 12, 42, 100, 257, 333):
        out = decode_mp3_main(encode_mp3_main(did))
        sch = mp3_main_schedule(did)
        assert out["n_frames"] == sch["n_frames"]
        sfb = SFB_LONG[out["sample_rate"]]
        gi = 0
        for f in range(sch["n_frames"]):
            both_long = not (sch["short"](f, 0) or sch["short"](f, 1))
            scfsi = sch["scfsi"](f) if both_long else 0
            for g in range(2):
                gr = out["granules"][gi]
                gi += 1
                short = sch["short"](f, g)
                assert gr["short"] == short
                covered.add(("short" if short else "long", out["sample_rate"]))
                bv = sch["big_values"](f, g)
                assert gr["big_values"] == bv
                assert gr["n_quads"] == sch["n_quads"](f, g)
                # independent replay of the spectral values
                if short:
                    bounds = [min(36, 2 * bv), 2 * bv]
                else:
                    r0c, r1c = sch["region0"](f, g), sch["region1"](f, g)
                    bounds = [
                        min(sfb[r0c + 1], 2 * bv),
                        min(sfb[r0c + r1c + 2], 2 * bv),
                        2 * bv,
                    ]
                want = []
                lo = 0
                for r, bound in enumerate(bounds):
                    m = _TMAX[sch["table"](f, g, r)]
                    if m == 0:
                        covered.add("zero_table")
                    for i in range(lo, bound):
                        v = sch["bv_value"](f, g, i, m)
                        if v and sch["bv_sign"](f, g, i):
                            v = -v
                        want.append(v)
                    lo = bound
                covered.add(("ct", sch["count1table"](f, g)))
                for q in range(sch["n_quads"](f, g)):
                    for p in range(4):
                        b = sch["c1_bit"](f, g, q, p)
                        if b and sch["c1_sign"](q, p):
                            b = -b
                        want.append(b)
                assert gr["values"] == want
                if scfsi and g == 1:
                    covered.add("scfsi_shared")
    # the doc set must actually exercise the full surface
    assert {("ct", 0), ("ct", 1), "zero_table", "scfsi_shared"} <= covered
    blocks = {t[0] for t in covered if isinstance(t, tuple) and t[0] in ("short", "long")}
    rates = {t[1] for t in covered if isinstance(t, tuple) and t[0] in ("short", "long")}
    assert blocks == {"short", "long"}
    assert rates == {44100, 48000, 32000}

    base = encode_mp3_main(42)
    with pytest.raises(ValueError):
        decode_mp3_main(b"")
    with pytest.raises(ValueError):
        decode_mp3_main(b"\x00" * 32)  # no sync
    with pytest.raises(ValueError):
        decode_mp3_main(base[:-5])  # truncated final frame
    b = bytearray(base)
    b[4] |= 0x80  # main_data_begin != 0 -> bit reservoir unsupported
    with pytest.raises(ValueError, match="reservoir"):
        decode_mp3_main(bytes(b))
    b = bytearray(base)
    b[1] = (b[1] & ~0b110) | 0b100  # layer bits -> Layer II
    with pytest.raises(ValueError):
        decode_mp3_main(bytes(b))


def test_mp3_requantization_oracle_crossengine_and_formula():
    """Layer III requantization (operators/mp3requant.py): (a) the
    registered SQL oracle, run in DuckDB over a bare doc_id relation,
    reproduces decode_mp3_requantized(encode_mp3_main(d)) BIT-EXACTLY
    on every aggregate — an independent-engine check of the shared
    literal-double fixed-point scheme; (b) the table path equals the
    spec formula |is|^(4/3) * 2^(q/4) within float tolerance; (c)
    scfsi-shared granule-1 scalefactors copy granule 0's effective
    values."""
    import math

    import duckdb
    import numpy as np

    from cobradb_spark.operators.mp3huff import decode_mp3_main, encode_mp3_main
    from cobradb_spark.operators.mp3requant import (
        P43,
        QP,
        _effective_long_scalefacs,
        decode_mp3_requantized,
    )
    from cobradb_spark.registry import get_query

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM range(0, 45) t(doc_id)")
    ora = (
        con.execute(get_query("multimodal_mp3_requantize_decode").oracle)
        .df()
        .set_index("doc_id")
        .sort_index()
    )
    cols = ("n_frames", "sample_rate", "sum_q", "n_requant_nz",
            "sum_xr_fp", "sum_abs_xr_fp", "sum_abs_short_fp")
    saw_short = saw_scfsi = 0
    for d in range(45):
        got = decode_mp3_requantized(encode_mp3_main(d))
        for c in cols:
            assert int(ora.loc[d, c]) == int(got[c]), (d, c)
        assert got["n_requant_nz"] == got["n_nonzero"]
        saw_short += got["n_short"]
        saw_scfsi += any(
            g["granule"] == 1 and g["scfsi"] for g in got["granules"]
        )
    assert saw_short and saw_scfsi  # fixture exercises both paths

    # (b) the literal-table factorization IS the spec formula
    for a in (1, 2, 3):
        for q in (-300, -123, -2, 0, 1, 7, 45):
            qs = q + 400
            table = P43[a] * QP[qs % 4] * 2.0 ** (qs // 4 - 100)
            direct = math.pow(a, 4.0 / 3.0) * math.pow(2.0, q / 4.0)
            assert abs(table - direct) <= 1e-12 * abs(direct), (a, q)

    # (c) scfsi sharing copies granule 0's effective values
    checked = 0
    for d in range(45):
        dec = decode_mp3_main(encode_mp3_main(d))
        g0 = {}
        for gr in dec["granules"]:
            if gr["short"]:
                continue
            if gr["granule"] == 0:
                g0[(gr["frame"], gr["ch"])] = np.asarray(gr["scalefacs"])
                continue
            if not gr["scfsi"]:
                continue
            eff = _effective_long_scalefacs(gr, g0[(gr["frame"], gr["ch"])])
            groups = ((0, 6), (6, 11), (11, 16), (16, 21))
            for k, (lo, hi) in enumerate(groups):
                if (gr["scfsi"] >> (3 - k)) & 1:
                    assert (eff[lo:hi] == g0[(gr["frame"], gr["ch"])][lo:hi]).all()
                    checked += 1
    assert checked > 0


def test_mp3_huffman_decoder_fuzz_never_crashes():
    """Mutation fuzz: flip one byte anywhere in a valid Layer III
    stream, or truncate it — decode_mp3_main must either raise
    ValueError (clean rejection) or return a well-formed dict; never
    an IndexError/KeyError crash, never a hang.  Kraft-completeness of
    the bundled codebooks means a corrupted payload can always decode
    SOME symbol — structural checks, not codeword lookup, do the
    rejecting."""
    import numpy as np

    from cobradb_spark.operators.mp3huff import decode_mp3_main, encode_mp3_main

    base = bytearray(encode_mp3_main(42))
    rng = np.random.default_rng(4242)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(300):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_mp3_main(bytes(b))
            assert out["n_frames"] >= 1
            assert len(out["granules"]) == 2 * out["n_frames"]
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for cut in range(1, 80):
        try:
            decode_mp3_main(bytes(base[:cut]))
        except ValueError:
            pass
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer2_lowrate_decode_exact_and_table_selection():
    """B.2c/B.2d contract (operators/mp2.py): (a) low-rate streams
    round-trip to the exact schedule values through the SAME general
    decode_layer2 used for 56-192 kbps; (b) the table derivation picks
    B.2d (sblimit 12) at 32 kHz and B.2c (sblimit 8) at 44.1/48 kHz;
    (c) the shared low-rate quantizer row has no 7-level class — alloc
    index 3 means 9 levels, not B.2a's 7; (d) subband samples stay
    exact rationals."""
    import numpy as np

    from cobradb_spark.operators.mp2 import (
        SCALEFACTOR,
        _applied_sf,
        decode_layer2,
        encode_layer2_lowrate,
        layer2_levels,
        layer2_lowrate_schedule,
    )

    # (c) the no-7-level row, both regions
    assert layer2_levels(0, 3, sblimit=8) == 9
    assert layer2_levels(5, 3, sblimit=8) == 9
    assert layer2_levels(11, 2, sblimit=12) == 5
    assert layer2_levels(0, 14, sblimit=12) == 16383
    # classic tables unchanged
    assert layer2_levels(11, 3) == 7

    seen_sblimits = set()
    for did in (0, 1, 2, 3, 5, 7, 12, 42, 100, 257):
        out = decode_layer2(encode_layer2_lowrate(did))
        sch = layer2_lowrate_schedule(did)
        assert out["sblimit"] == sch["sblimit"]
        assert (out["sample_rate"] == 32000) == (sch["sblimit"] == 12)
        seen_sblimits.add(out["sblimit"])
        # independent replay of every sample
        want = np.zeros((sch["n_frames"] * 36, 32))
        code_sum = 0
        for f in range(sch["n_frames"]):
            for sb in sch["alloc_sbs"]:
                lv = sch["levels"](sb)
                t = [sch["sf_t"](sb, j) for j in range(3)]
                applied = _applied_sf(sch["scfsi"](sb), *t)
                for gr in range(12):
                    sf = SCALEFACTOR[applied[gr // 4]]
                    for k in range(3):
                        v = sch["code"](f, sb, gr, k, lv)
                        code_sum += v
                        want[f * 36 + gr * 3 + k, sb] = sf * (2 * v + 1 - lv) / lv
        assert out["code_sum"] == code_sum
        assert np.array_equal(out["subband_samples"], want)
    assert seen_sblimits == {8, 12}


def test_layer2_lowrate_fuzz_never_crashes():
    """Mutation fuzz over a low-rate stream: same discipline as the
    B.2a/B.2b fuzz — ValueError or a well-formed decode, never a
    crash."""
    import numpy as np

    from cobradb_spark.operators.mp2 import decode_layer2, encode_layer2_lowrate

    base = bytearray(encode_layer2_lowrate(42))
    rng = np.random.default_rng(4242)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_layer2(bytes(b))
            assert out["n_frames"] >= 1
            assert out["subband_samples"].shape[1] == 32
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for cut in range(1, 64):
        try:
            decode_layer2(bytes(base[:cut]))
        except ValueError:
            pass
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_mp3_bit_reservoir_framing_independence_and_underrun():
    """Bit-reservoir contract (operators/mp3huff.py): (a) the reservoir
    framing decodes to EXACTLY the same granule records as the
    contiguous (main_data_begin = 0) framing of the same schedule —
    framing independence is what a conformant decoder must provide;
    (b) every fixture doc actually exercises the reservoir
    (main_data_begin > 0 somewhere); (c) a main_data_begin pointing
    past the available reservoir is rejected loudly; (d) stuffing
    bytes between frames never leak into decoded values."""
    import pytest

    from cobradb_spark.operators.mp3 import _BitReader
    from cobradb_spark.operators.mp3huff import (
        decode_mp3_main,
        encode_mp3_main,
        encode_mp3_reservoir,
        frame_length,
    )

    for did in (0, 1, 2, 3, 5, 7, 12, 42, 100, 257, 333):
        a = decode_mp3_main(encode_mp3_main(did))
        b = decode_mp3_main(encode_mp3_reservoir(did))
        assert a["granules"] == b["granules"]
        assert {k: v for k, v in a.items() if k != "granules"} == {
            k: v for k, v in b.items() if k != "granules"
        }
        # reservoir exercised: md > 0 on at least one frame
        raw = encode_mp3_reservoir(did)
        pos, mds = 0, []
        while pos < len(raw):
            b2 = raw[pos + 2]
            si = _BitReader(raw[pos + 4 : pos + 21])
            mds.append(si.read(9))
            pos += frame_length(b2 >> 4, (b2 >> 2) & 3, (b2 >> 1) & 1)
        assert mds[0] == 0 and any(m > 0 for m in mds[1:]), (did, mds)

    # underrun: first frame claiming reservoir bytes that do not exist
    raw = bytearray(encode_mp3_reservoir(42))
    raw[4] |= 0x80  # main_data_begin high bit on frame 0
    with pytest.raises(ValueError, match="reservoir underrun"):
        decode_mp3_main(bytes(raw))


def test_mp3_reservoir_fuzz_never_crashes():
    """Mutation fuzz over a reservoir stream — the reassembly path adds
    framing state (the rolling 511-byte tail), so it gets its own fuzz
    discipline: ValueError or a well-formed decode, never a crash."""
    import numpy as np

    from cobradb_spark.operators.mp3huff import decode_mp3_main, encode_mp3_reservoir

    base = bytearray(encode_mp3_reservoir(42))
    rng = np.random.default_rng(4242)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(300):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_mp3_main(bytes(b))
            assert out["n_frames"] >= 1
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for cut in range(1, 80):
        try:
            decode_mp3_main(bytes(base[:cut]))
        except ValueError:
            pass
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer2_stereo_decode_exact_and_channel_interleave():
    """Two-channel Layer II contract (operators/mp2.py
    decode_layer2_general): (a) stereo/joint/dual streams round-trip to
    the exact schedule values — per-channel samples below the bound,
    shared codes with per-channel scalefactors above it; (b) all three
    modes and both B.2a/B.2b tables are exercised; (c) the mono entry
    point still rejects stereo streams; (d) stereo at a single-channel-
    only bitrate is rejected with the accurate message."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.mp2 import (
        SCALEFACTOR,
        _applied_sf,
        decode_layer2,
        decode_layer2_general,
        encode_layer2_stereo,
        layer2_stereo_schedule,
    )

    seen = set()
    for did in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 42, 100):
        out = decode_layer2_general(encode_layer2_stereo(did))
        sch = layer2_stereo_schedule(did)
        seen.add((sch["mode"], sch["sblimit"]))
        bound = sch["bound"]
        want = np.zeros((sch["n_frames"] * 36, 32, 2))
        code_sum = 0
        for f in range(sch["n_frames"]):
            for sb in sch["alloc_sbs"]:
                for ch in range(2):
                    lv = sch["levels"](ch, sb)
                    t = [sch["sf_t"](ch, sb, j) for j in range(3)]
                    applied = _applied_sf(sch["scfsi"](ch, sb), *t)
                    for gr in range(12):
                        sf = SCALEFACTOR[applied[gr // 4]]
                        for k in range(3):
                            v = sch["code"](f, ch, sb, gr, k, lv)
                            if ch == 0 or sb < bound:
                                code_sum += v
                            want[f * 36 + gr * 3 + k, sb, ch] = (
                                sf * (2 * v + 1 - lv) / lv
                            )
        assert out["code_sum"] == code_sum
        assert np.array_equal(out["subband_samples"], want)
        # intensity region really is shared: identical codes, own sf
        if sch["mode"] == 1:
            shared = [sb for sb in sch["alloc_sbs"] if sb >= bound]
            for sb in shared:
                assert sch["levels"](0, sb) == sch["levels"](1, sb)

    assert {m for m, _ in seen} == {0, 1, 2}
    assert {t for _, t in seen} == {27, 30}

    raw = encode_layer2_stereo(0)
    with pytest.raises(ValueError, match="not single-channel"):
        decode_layer2(raw)
    b = bytearray(raw)
    b[2] = (b[2] & 0x0F) | (2 << 4)  # bitrate idx 2 = 48 kbps total
    with pytest.raises(ValueError, match="single-channel-only"):
        decode_layer2_general(bytes(b))


def test_layer2_stereo_fuzz_never_crashes():
    """Mutation fuzz over stereo/joint streams (the channel interleave
    and bound arithmetic add parse state): ValueError or a well-formed
    decode, never a crash."""
    import numpy as np

    from cobradb_spark.operators.mp2 import (
        decode_layer2_general,
        encode_layer2_stereo,
    )

    for seed_doc in (3, 7):  # a joint-stereo doc and a dual doc
        base = bytearray(encode_layer2_stereo(seed_doc))
        rng = np.random.default_rng(4242 + seed_doc)
        outcomes = {"ok": 0, "rejected": 0}
        for _ in range(200):
            b = bytearray(base)
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= int(rng.integers(1, 256))
            try:
                out = decode_layer2_general(bytes(b))
                assert out["n_frames"] >= 1
                assert out["subband_samples"].shape[1:] == (32, 2)
                outcomes["ok"] += 1
            except ValueError:
                outcomes["rejected"] += 1
        for cut in range(1, 64):
            try:
                decode_layer2_general(bytes(base[:cut]))
            except ValueError:
                pass
        assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer1_stereo_decode_exact_and_mode_gate():
    """Two-channel Layer I contract (operators/mp3.py
    decode_layer1_general): (a) stereo/joint/dual streams round-trip
    bit-exactly against an independent schedule replay, including
    ch0-only and ch1-only subbands below the intensity bound and
    shared samples (per-channel scalefactors) above it; (b) the mono
    entry point now REJECTS stereo streams — before r11 it ignored the
    mode bits and would have silently misparsed the interleave."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.mp3 import (
        SCALEFACTOR,
        decode_layer1,
        decode_layer1_general,
        encode_layer1_stereo,
        layer1_stereo_schedule,
    )

    seen = set()
    for did in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 42, 100):
        out = decode_layer1_general(encode_layer1_stereo(did))
        sch = layer1_stereo_schedule(did)
        seen.add(sch["mode"])
        nf, bound = sch["n_frames"], sch["bound"]
        want = np.zeros((nf * 12, 32, 2))
        for f in range(nf):
            for sb in range(32):
                for ch in range(2):
                    cc = ch if sb < bound else 0
                    if not sch["member"](cc, sb):
                        continue
                    n = sch["nb"](cc, sb)
                    sf = SCALEFACTOR[sch["sf_idx"](ch, sb)]
                    for t in range(12):
                        c = sch["code"](f, cc, sb, t)
                        want[f * 12 + t, sb, ch] = (
                            sf * (2 * c + 2 - (1 << n)) / ((1 << n) - 1)
                        )
        assert np.array_equal(out["subband_samples"], want), did
        # asymmetric membership really occurs below the bound
        asym = [
            sb for sb in range(min(bound, 32))
            if sch["member"](0, sb) != sch["member"](1, sb)
        ]
        if sch["n0"] != 1 + sch["n1"]:
            assert asym, did
    assert seen == {0, 1, 2}

    with pytest.raises(ValueError, match="not single-channel"):
        decode_layer1(encode_layer1_stereo(0))


def test_layer1_stereo_fuzz_never_crashes():
    import numpy as np

    from cobradb_spark.operators.mp3 import (
        decode_layer1_general,
        encode_layer1_stereo,
    )

    for seed_doc in (4, 7):  # joint and dual
        base = bytearray(encode_layer1_stereo(seed_doc))
        rng = np.random.default_rng(999 + seed_doc)
        outcomes = {"ok": 0, "rejected": 0}
        for _ in range(200):
            b = bytearray(base)
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= int(rng.integers(1, 256))
            try:
                out = decode_layer1_general(bytes(b))
                assert out["n_frames"] >= 1
                outcomes["ok"] += 1
            except ValueError:
                outcomes["rejected"] += 1
        for cut in range(1, 64):
            try:
                decode_layer1_general(bytes(base[:cut]))
            except ValueError:
                pass
        assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_mp3_stereo_decode_channel_exact_and_mode_gates():
    """Two-channel Layer III contract (operators/mp3huff.py): (a) each
    channel of the stereo stream decodes to EXACTLY the mono decode of
    its virtual doc (6*doc + 3*ch + doc%3) — granule-level equality
    across the gr0ch0 gr0ch1 gr1ch0 gr1ch1 interleave; (b) all three
    accepted modes occur; (c) the mono entry point rejects stereo;
    (d) intensity/MS joint stereo (mode_extension != 0) rejects with
    the scope message."""
    import pytest

    from cobradb_spark.operators.mp3huff import (
        decode_mp3_main,
        decode_mp3_main_general,
        encode_mp3_main,
        encode_mp3_stereo,
        mp3_stereo_virtual_docs,
    )

    seen = set()
    for did in (0, 1, 2, 3, 4, 5, 6, 7, 8, 42, 100):
        st = decode_mp3_main_general(encode_mp3_stereo(did))
        seen.add((did // 3) % 3)
        monos = [
            decode_mp3_main(encode_mp3_main(v))
            for v in mp3_stereo_virtual_docs(did)
        ]
        assert st["n_frames"] == monos[0]["n_frames"] == monos[1]["n_frames"]
        for gr in st["granules"]:
            ref = next(
                g for g in monos[gr["ch"]]["granules"]
                if g["frame"] == gr["frame"] and g["granule"] == gr["granule"]
            )
            for k in ("short", "scalefacs", "values", "n_quads",
                      "big_values", "tabs", "ct"):
                assert gr[k] == ref[k], (did, gr["frame"], gr["granule"], gr["ch"], k)
    assert seen == {0, 1, 2}

    raw = encode_mp3_stereo(0)
    with pytest.raises(ValueError, match="not single-channel"):
        decode_mp3_main(raw)
    b = bytearray(encode_mp3_stereo(3))  # joint doc
    assert (b[3] >> 6) == 0b01
    b[3] |= 0x20  # mode_extension bit -> MS on
    with pytest.raises(ValueError, match="intensity/MS"):
        decode_mp3_main_general(bytes(b))


def test_mp3_stereo_fuzz_never_crashes():
    import numpy as np

    from cobradb_spark.operators.mp3huff import (
        decode_mp3_main_general,
        encode_mp3_stereo,
    )

    for seed_doc in (3, 7):  # joint and dual
        base = bytearray(encode_mp3_stereo(seed_doc))
        rng = np.random.default_rng(777 + seed_doc)
        outcomes = {"ok": 0, "rejected": 0}
        for _ in range(250):
            b = bytearray(base)
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= int(rng.integers(1, 256))
            try:
                out = decode_mp3_main_general(bytes(b))
                assert out["n_frames"] >= 1
                outcomes["ok"] += 1
            except ValueError:
                outcomes["rejected"] += 1
        for cut in range(1, 90):
            try:
                decode_mp3_main_general(bytes(base[:cut]))
            except ValueError:
                pass
        assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer2_mid_stream_bound_switch_rejected():
    """A per-frame intensity-bound change is spec-legal but this
    decoder reports ONE stream-level bound column, so it must reject
    rather than emit an ill-defined value (round-11 review finding)."""
    import pytest

    from cobradb_spark.operators.mp2 import (
        decode_layer2_general,
        encode_layer2_stereo,
        layer2_frame_bytes,
        layer2_stereo_schedule,
    )

    did = 3  # joint-stereo doc with >=2 frames
    sch = layer2_stereo_schedule(did)
    assert sch["mode"] == 1 and sch["n_frames"] >= 2
    raw = bytearray(encode_layer2_stereo(did))
    # walk to frame 1's header and change its mode_extension
    b2 = raw[2]
    flen = layer2_frame_bytes(b2 >> 4, (b2 >> 2) & 3, (b2 >> 1) & 1)
    old_ext = (raw[flen + 3] >> 4) & 0b11
    raw[flen + 3] = (raw[flen + 3] & 0xCF) | (((old_ext + 1) % 4) << 4)
    with pytest.raises(ValueError, match="intensity-bound switch"):
        decode_layer2_general(bytes(raw))


def test_crc_protection_roundtrip_and_rejection_all_layers():
    """ISO 11172-3 2.4.3.1 crc_check: (a) protection_bit=0 streams with
    a REAL CRC-16 (x^16+x^15+x^2+1, init 0xFFFF, over header bits
    16-31 + the layer-dependent protected span) decode to exactly the
    unprotected decode — before r11 the protection bit was IGNORED, so
    a protected stream's crc word was silently misparsed as side info;
    (b) flipping any bit of the protected span raises a crc_check
    mismatch; (c) flipping the crc word itself rejects too."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.mp2 import decode_layer2, encode_layer2
    from cobradb_spark.operators.mp3 import decode_layer1, encode_layer1
    from cobradb_spark.operators.mp3huff import decode_mp3_main, encode_mp3_main

    for enc, dec in [
        (encode_layer1, decode_layer1),
        (encode_layer2, decode_layer2),
        (encode_mp3_main, decode_mp3_main),
    ]:
        for did in (0, 1, 5, 42, 257):
            a, b = dec(enc(did)), dec(enc(did, protect=True))
            for k in a:
                if isinstance(a[k], np.ndarray):
                    assert np.array_equal(a[k], b[k]), (enc.__name__, did, k)
                else:
                    assert a[k] == b[k], (enc.__name__, did, k)
        raw = enc(42, protect=True)
        # crc word corrupt
        m = bytearray(raw)
        m[4] ^= 0xFF
        with pytest.raises(ValueError):
            dec(bytes(m))
        # every byte of the first frame's protected span must be covered
        span = range(6, 6 + (17 if enc is encode_mp3_main else 8))
        for i in span:
            m = bytearray(raw)
            m[i] ^= 0x10
            with pytest.raises(ValueError):
                dec(bytes(m))


def test_mp3_index_free_format_and_id3v1():
    """index_mp3 real-world container coverage (r11): (a) FREE-FORMAT
    streams (bitrate index 0) index via syncword-spacing length
    discovery, constant (+padding slot) thereafter, with the derived
    kbps reported; (b) a 128-byte ID3v1 'TAG' trailer is excluded from
    the frame walk and reported; (c) free/table-rate mixing rejects in
    both orders; (d) the pre-existing fixture indexes identically
    (id3v1_bytes 0, free_format False)."""
    import pytest

    from cobradb_spark.operators.mp3 import encode_mp3, frame_length, index_mp3

    def freeframe(sr_idx, pad, n=120):
        b1 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 0b1
        hdr = bytes((0xFF, b1, (sr_idx << 2) | (pad << 1), 0xC4))
        return hdr + bytes((n + pad) - 4)

    stream = b"".join(freeframe(1, p) for p in (0, 1, 0, 0, 1))
    ix = index_mp3(stream)
    assert ix["free_format"] and ix["n_frames"] == 5
    assert ix["bitrate_sum_kbps"] == 5 * (120 * 48000 // 144000)
    ix2 = index_mp3(stream + b"TAG" + bytes(125))
    assert ix2["n_frames"] == 5 and ix2["id3v1_bytes"] == 128
    assert index_mp3(freeframe(2, 0))["n_frames"] == 1  # single-frame

    tbl = bytes((0xFF, 0xFB, (9 << 4) | (1 << 2), 0xC4))
    tbl += bytes(frame_length(9, 1, 0) - 4)
    with pytest.raises(ValueError, match="inside a free-format"):
        index_mp3(freeframe(1, 0) + tbl)
    with pytest.raises(ValueError, match="free-format frame after"):
        index_mp3(tbl + freeframe(1, 0))

    norm = encode_mp3(42)
    base = index_mp3(norm)
    assert base["id3v1_bytes"] == 0 and base["free_format"] is False
    trailed = index_mp3(norm + b"TAG" + bytes(125))
    assert trailed["n_frames"] == base["n_frames"]
    assert trailed["id3v1_bytes"] == 128


def test_png_adam7_interlace_roundtrip_and_compat():
    """Adam7 contract (operators/png.py): (a) interlaced encode ->
    decode is bit-exact across shapes that exercise ragged and ABSENT
    passes (w or h below the 8/4/2 pass offsets); (b) interlaced and
    progressive encodings of the same image decode identically;
    (c) interlace methods other than 0/1 reject."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from cobradb_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (7, 13, 3), (9, 32, 3), (1, 1, 3),
                  (2, 3, 3), (8, 1, 3), (1, 9, 3), (33, 17, 3)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        inter = decode_png(encode_png(img, interlace=True))
        assert (inter == img).all(), shape
        prog = decode_png(encode_png(img))
        assert (inter == prog).all(), shape

    # unknown interlace method rejects
    raw = bytearray(encode_png(rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)))
    # IHDR body starts at offset 16; interlace byte is its 13th byte
    raw[16 + 12] = 2
    body = bytes(raw[12:29])
    raw[29:33] = struct.pack(">I", zlib.crc32(body))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(raw))


def test_gif_interlace_and_animation_roundtrip():
    """GIF surface completion (operators/gif.py): (a) 4-pass row
    interlacing round-trips bit-exactly, including heights where later
    passes are empty; (b) animated streams decode every frame with GCE
    delays; (c) sub-rectangle frames composite over the previous frame
    (disposal 1); (d) restore-disposals and transparency composite
    correctly (reserved disposals 4-7 reject); (e) the single-frame
    entry decodes interlaced images too."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_animated,
    )

    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
    for h, w in [(16, 9), (7, 13), (1, 5), (3, 3), (8, 1), (2, 2)]:
        idx = rng.integers(0, 32, (h, w)).astype(np.uint8)
        want = pal[idx.astype(np.int64)]
        assert np.array_equal(decode_gif(encode_gif(idx, pal, interlace=True)), want), (h, w)

    frames = [rng.integers(0, 32, (10, 12)).astype(np.uint8) for _ in range(3)]
    raw = encode_gif_animated(frames, pal, delays_cs=[7, 8, 9], interlace=True)
    out = decode_gif_frames(raw)
    assert out["delays_cs"] == [7, 8, 9] and out["interlaced"]
    for f, got in zip(frames, out["frames"]):
        assert np.array_equal(got, pal[f.astype(np.int64)])

    # sub-rectangle compositing: hand-build frame 2 as a 2x3 patch
    import struct as _s

    from cobradb_spark.operators.gif import _image_block

    base = encode_gif_animated(frames[:1], pal, delays_cs=[5])
    patch = rng.integers(0, 32, (2, 3)).astype(np.uint8)
    raw2 = base[:-1] + _image_block(patch, 5, 4, 3, False) + b"\x3b"
    out2 = decode_gif_frames(raw2)
    assert len(out2["frames"]) == 2
    want = out2["frames"][0].copy()
    want[3:5, 4:7] = pal[patch.astype(np.int64)]
    assert np.array_equal(out2["frames"][1], want)

    # reserved disposal methods (4-7) reject loudly
    raw3 = bytearray(encode_gif_animated(frames, pal))
    gce = raw3.index(b"\x21\xf9")
    raw3[gce + 3] |= 0x10  # disposal 4 (reserved)
    with pytest.raises(ValueError, match="disposal"):
        decode_gif_frames(bytes(raw3))


def test_gif_transparency_and_restore_disposals():
    """GCE-surface closure (operators/gif.py): transparency holes show
    the underlying canvas; disposal 2 restores the frame's rect to the
    LSD background color; disposal 3 reverts the canvas to its
    pre-frame state; the expected canvases are replayed independently
    with plain numpy (the same fold the SQL oracle expresses as a
    last-effective-writer scan)."""
    import numpy as np

    from cobradb_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_composited,
    )

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    sw, sh, bg, t = 11, 9, 5, 15
    base = rng.integers(0, 15, (sh, sw)).astype(np.uint8)  # opaque (never 15)
    patch1 = rng.integers(0, 16, (4, 5)).astype(np.uint8)  # has T holes
    patch2 = rng.integers(0, 15, (3, 4)).astype(np.uint8)
    patch3 = rng.integers(0, 16, (5, 6)).astype(np.uint8)
    specs = [
        dict(indices=base, left=0, top=0, disposal=1, transparent=None, delay_cs=4),
        dict(indices=patch1, left=2, top=3, disposal=2, transparent=t, delay_cs=5),
        dict(indices=patch2, left=6, top=1, disposal=3, transparent=None, delay_cs=6),
        dict(indices=patch3, left=1, top=2, disposal=1, transparent=t, delay_cs=7),
    ]
    out = decode_gif_frames(encode_gif_composited((sw, sh), specs, pal, bg_index=bg))
    assert out["delays_cs"] == [4, 5, 6, 7]
    assert len(out["frames"]) == 4

    # independent numpy replay of the documented compositing fold
    state = np.broadcast_to(pal[bg], (sh, sw, 3)).copy()
    want = []
    for s in specs:
        h, w = s["indices"].shape
        disp = state.copy()
        reg = disp[s["top"] : s["top"] + h, s["left"] : s["left"] + w]
        if s["transparent"] is None:
            reg[:] = pal[s["indices"].astype(int)]
        else:
            m = s["indices"] != s["transparent"]
            reg[m] = pal[s["indices"].astype(int)][m]
        want.append(disp)
        if s["disposal"] == 2:
            state = disp.copy()
            state[s["top"] : s["top"] + h, s["left"] : s["left"] + w] = pal[bg]
        elif s["disposal"] != 3:
            state = disp
    for got, exp in zip(out["frames"], want):
        assert np.array_equal(got, exp)
    # the three behaviors are actually distinguishable in this fixture:
    # frame 2 sees bg in frame 1's rect (disposal 2)...
    assert np.array_equal(out["frames"][2][3:7, 2:7], want[2][3:7, 2:7])
    assert (out["frames"][2][4, 3] == pal[bg]).all()
    # ...and frame 3 does NOT see frame 2's patch (disposal 3 reverted)
    reverted = out["frames"][3][1:4, 6:10]
    frame2_patch = pal[patch2.astype(int)]
    assert not np.array_equal(reverted, frame2_patch) or (base[1:4, 6:10] == patch2).all()


def test_flac_stereo_decorrelation_and_lpc():
    """FLAC subset-bound closure (operators/flac.py): (a) stereo
    streams round-trip losslessly through ALL FOUR channel assignments
    (the fixture rotates them per frame) across smooth, noisy, and
    constant-channel content; (b) LPC subframes decode exactly, and on
    resonant AR(2) content (poles away from the fixed (1-z)^k family)
    the LPC stream is strictly smaller — proving the quantized
    predictor is genuinely selected and inverted; (c) the mono entry
    point rejects stereo streams; (d) MD5 covers the interleave."""
    import numpy as np
    import pytest

    from cobradb_spark.operators.flac import (
        decode_flac,
        decode_flac_general,
        encode_flac_stereo,
    )

    rng = np.random.default_rng(5)
    for t in range(8):
        n = int(rng.integers(60, 2500))
        i = np.arange(n)
        l = np.clip(
            (np.round(8000 * np.sin(i / 9.0)) + rng.integers(-20, 20, n)).astype(np.int64),
            -32768, 32767,
        )
        r = rng.integers(-32768, 32768, n).astype(np.int64)
        got, rate = decode_flac_general(encode_flac_stereo(l, r))
        assert np.array_equal(got[:, 0], l) and np.array_equal(got[:, 1], r), t
    const = np.full(900, 7, dtype=np.int64)
    got, _ = decode_flac_general(encode_flac_stereo(const, -const))
    assert (got[:, 0] == 7).all() and (got[:, 1] == -7).all()

    # LPC: resonant AR(2) far from the fixed predictors
    n = 4000
    x = np.zeros(n, dtype=np.int64)
    for i in range(2, n):
        x[i] = (154 * x[i - 1] - 92 * x[i - 2]) // 128 + int(rng.integers(-800, 800))
        x[i] = max(-32000, min(32000, x[i]))
    raw_lpc = encode_flac_stereo(x, x // 3, use_lpc=True)
    raw_fix = encode_flac_stereo(x, x // 3, use_lpc=False)
    assert len(raw_lpc) < len(raw_fix)  # LPC genuinely selected
    got, _ = decode_flac_general(raw_lpc)
    assert np.array_equal(got[:, 0], x) and np.array_equal(got[:, 1], x // 3)

    with pytest.raises(ValueError, match="mono-only"):
        decode_flac(raw_lpc)
    # MD5 covers the channel interleave: flip one sample byte
    bad = bytearray(encode_flac_stereo(const, -const))
    bad[-3] ^= 0x04
    with pytest.raises(ValueError):
        decode_flac_general(bytes(bad))


def test_flac_stereo_fuzz_never_crashes():
    import numpy as np

    from cobradb_spark.operators.flac import decode_flac_general, encode_flac_stereo

    rng = np.random.default_rng(4242)
    i = np.arange(1200)
    l = np.clip(np.round(5000 * np.sin(i / 7.0)).astype(np.int64), -32768, 32767)
    base = bytearray(encode_flac_stereo(l, -l // 2))
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(250):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out, _ = decode_flac_general(bytes(b))
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for cut in range(1, 80):
        try:
            decode_flac_general(bytes(base[:cut]))
        except ValueError:
            pass
    # FLAC is CRC+MD5 guarded end to end: essentially every mutation
    # must be REJECTED (a passing mutation would be a guard hole)
    assert outcomes["rejected"] >= 245, outcomes


def test_mp3_imdct_pcm_chain_crossengine_and_float_reference():
    """Layer III time-domain chain (operators/mp3imdct.py): (a) both
    registered SQL oracles, run in DuckDB over a bare doc_id relation,
    reproduce the Python decode BIT-EXACTLY; (b) the whole fixed-point
    pipeline (alias -> reorder -> windowed IMDCT -> overlap-add ->
    inversion -> synthesis) tracks an independent FLOAT-domain
    reference built from the spec formulas (cos/sin evaluated directly,
    no shared tables) within fixed-point tolerance on a high-gain
    document; (c) start/stop long windows are valid block types with
    the normal window's first half (start) / second half (stop); (d)
    granule overlap-add and odd/odd frequency inversion are exactly
    z_cur[:18] + z_prev[18:] with sign flips."""
    import duckdb
    import numpy as np

    from cobradb_spark.operators import mp3imdct as m
    from cobradb_spark.operators.mp3huff import decode_mp3_main, encode_mp3_main
    from cobradb_spark.operators.mp3requant import requantize_lines
    from cobradb_spark.registry import get_query

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM range(180, 260) t(doc_id)")
    ora = (
        con.execute(get_query("multimodal_mp3_imdct_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    orap = (
        con.execute(get_query("multimodal_mp3_pcm_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    any_nz = 0
    for d in range(180, 260):
        got = m.decode_mp3_imdct(encode_mp3_main(d))
        for c in ("n_frames", "sample_rate", "n_ts_nz", "sum_ts_fp",
                  "sum_abs_ts_fp", "sum_ts_w_fp"):
            assert int(ora.loc[d, c]) == int(got[c]), (d, c)
        any_nz += got["n_ts_nz"]
        if d % 10 == 0:
            gp = m.decode_mp3_pcm(encode_mp3_main(d))
            for c in ("n_pcm", "n_pcm_nz", "sum_pcm_fp",
                      "sum_abs_pcm_fp", "sum_pcm_w_fp"):
                assert int(orap.loc[d, c]) == int(gp[c]), (d, c)
    assert any_nz > 0  # the gg window makes these docs non-silent

    # (b) float-domain reference, spec formulas evaluated directly
    def float_ts(dec):
        sr = dec["sample_rate"]
        out = []
        prev = np.zeros((32, 36))
        inv = np.ones((32, 18))
        inv[1::2, 1::2] = -1.0
        cs = 1.0 / np.sqrt(1.0 + np.asarray(m._ALIAS_C) ** 2)
        ca = np.asarray(m._ALIAS_C) * cs
        jj = np.arange(36)[:, None]
        kk = np.arange(18)[None, :]
        basis = np.cos(np.pi / 72 * (2 * jj + 19) * (2 * kk + 1)) * np.sin(
            np.pi / 36 * (jj + 0.5)
        )[:, None].reshape(36, 1)
        j12 = np.arange(12)[:, None]
        p6 = np.arange(6)[None, :]
        b12 = np.cos(np.pi / 24 * (2 * j12 + 7) * (2 * p6 + 1)) * np.sin(
            np.pi / 12 * (j12 + 0.5)
        ).reshape(12, 1)
        for rec in requantize_lines(dec):
            xr = rec["xr_fp"].astype(np.float64) / 1e9
            if rec["short"]:
                ro = np.zeros(576)
                ro[m._REORDER[sr]] = xr
                xm = ro.reshape(32, 6, 3)
                z = np.zeros((32, 36))
                for w in range(3):
                    z[:, 6 + 6 * w : 18 + 6 * w] += np.einsum(
                        "jp,sp->sj", b12, xm[:, :, w]
                    )
            else:
                al = xr.copy()
                for sb in range(1, 32):
                    for i in range(8):
                        u, l = 18 * sb - 1 - i, 18 * sb + i
                        al[u], al[l] = (
                            xr[u] * cs[i] - xr[l] * ca[i],
                            xr[l] * cs[i] + xr[u] * ca[i],
                        )
                z = al.reshape(32, 18) @ basis.T
            out.append(((z[:, :18] + prev[:, 18:]) * inv).T)
            prev = z
        return np.concatenate(out, axis=0)

    dec = decode_mp3_main(encode_mp3_main(251))  # gg ~ 251: large values
    ts_fp = m.time_samples(dec)[0].astype(np.float64) * (1 << m.XR_DIV_BITS) / 1e9
    ts_ref = float_ts(dec)
    scale = np.abs(ts_ref).max()
    assert scale > 1.0  # genuinely loud fixture
    # fixed-point steps (2^18 coefficients, 3 floor stages) stay well
    # under 1e-3 relative at this magnitude
    assert np.abs(ts_fp - ts_ref).max() <= 1e-3 * scale

    # float polyphase reference for the same doc
    s = m.time_samples(dec)[0]
    pcm_fp = m.synthesis_pcm(s).astype(np.float64)
    nmat = np.cos((16 + np.arange(64))[:, None] * (2 * np.arange(32))[None, :] + 0.0)
    i512 = np.arange(512)
    dwin = (0.5 - 0.5 * np.cos(2 * np.pi * (i512 + 0.5) / 512)) * np.sinc(
        (i512 - 255.5) / 64.0
    )
    nref = np.cos((16 + np.arange(64))[:, None] * (2 * np.arange(32)[None, :] + 1) * np.pi / 64)
    sf = s.astype(np.float64)
    vref = sf @ nref.T
    vp = np.vstack([np.zeros((15, 64)), vref])
    t_total = sf.shape[0]
    raw = np.zeros((t_total, 32))
    for i in range(8):
        raw += dwin[np.arange(32) + 64 * i][None, :] * vp[15 - 2 * i : 15 - 2 * i + t_total, :32]
        raw += dwin[np.arange(32) + 64 * i + 32][None, :] * vp[14 - 2 * i : 14 - 2 * i + t_total, 32:]
    pcm_ref = raw / (1 << (m.TS_DIV_BITS + m.V_DIV_BITS))
    pscale = np.abs(pcm_ref).max()
    assert pscale > 0
    assert np.abs(pcm_fp - pcm_ref).max() <= 2e-3 * pscale + 2.0

    # (c) start/stop windows
    w0, w1, w3 = m._long_window(0), m._long_window(1), m._long_window(3)
    assert np.allclose(w1[:18], w0[:18]) and np.allclose(w3[18:], w0[18:])
    assert (w1[18:24] == 1).all() and (w3[12:18] == 1).all()
    assert (w1[30:] == 0).all() and (w3[:6] == 0).all()
    xr = np.zeros(576, dtype=np.int64)
    xr[7] = 10**12
    z_start = m.granule_z(xr, False, 44100, bt_long=1)
    z_stop = m.granule_z(xr, False, 44100, bt_long=3)
    z_norm = m.granule_z(xr, False, 44100, bt_long=0)
    assert (z_start != z_norm).any() and (z_stop != z_norm).any()
    assert (z_start[0, 30:] == 0).all() and (z_stop[0, :6] == 0).all()
    try:
        m.granule_z(xr, False, 44100, bt_long=2)
        raise AssertionError("short block type must not reach the long path")
    except ValueError:
        pass

    # (d) overlap-add + inversion algebra on the real stream
    sr = dec["sample_rate"]
    recs = sorted(requantize_lines(dec), key=lambda r: (r["frame"], r["granule"]))
    z0 = m.granule_z(recs[0]["xr_fp"], recs[0]["short"], sr)
    z1 = m.granule_z(recs[1]["xr_fp"], recs[1]["short"], sr)
    ts_all = m.time_samples(dec)[0]
    inv = np.ones((32, 18), dtype=np.int64)
    inv[1::2, 1::2] = -1
    assert (ts_all[:18] == (z0[:, :18] * inv).T).all()
    assert (ts_all[18:36] == ((z1[:, :18] + z0[:, 18:]) * inv).T).all()


def test_mp3_pcm_decoder_fuzz_never_crashes():
    """Mutation fuzz through the FULL chain (symbols -> requantize ->
    alias/IMDCT -> synthesis): flip one byte in a valid stream —
    decode_mp3_pcm must either raise ValueError/NotImplementedError
    (linbits escapes are a documented requantization boundary) or
    return well-formed integer aggregates; never an index crash and
    never an int64-range excursion (the documented stage bounds hold
    for ANY decodable symbol content, since |is|<=3 is enforced)."""
    import numpy as np

    from cobradb_spark.operators.mp3huff import encode_mp3_main
    from cobradb_spark.operators.mp3imdct import decode_mp3_pcm

    base = bytearray(encode_mp3_main(251))
    rng = np.random.default_rng(2511)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_mp3_pcm(bytes(b))
            assert out["n_pcm"] == 36 * out["n_frames"] * 32
            assert 0 <= out["n_pcm_nz"] <= out["n_pcm"]
            assert abs(out["sum_pcm_fp"]) <= out["sum_abs_pcm_fp"] < 1 << 62
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["rejected"] += 1
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_layer1_layer2_pcm_crossengine_and_shared_filterbank():
    """Layers I and II to PCM through the SHARED polyphase filterbank
    (operators/mp3imdct.py synthesis_pcm): (a) both registered SQL
    oracles reproduce the Python decode BIT-EXACTLY over a bare doc_id
    relation; (b) the 2^28 fixed-point subband samples equal the
    decoders' float samples within one quantum (so the synthesis input
    is the same audio, not a parallel approximation); (c) one
    filterbank serves all three layers: feeding Layer II's samples
    through the same synthesis_pcm used by Layer III is what the keys
    do — verify the function is literally shared and zero-input
    produces zero output with the FIFO's zero warm-up."""
    import duckdb
    import numpy as np

    from cobradb_spark.operators import mp3imdct as m
    from cobradb_spark.operators.mp2 import decode_layer2, encode_layer2
    from cobradb_spark.operators.mp3 import SF_FP, decode_layer1, encode_layer1
    from cobradb_spark.registry import get_query

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM range(0, 80) t(doc_id)")
    ora1 = (
        con.execute(get_query("multimodal_mp1_pcm_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    ora2 = (
        con.execute(get_query("multimodal_mp2_pcm_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    assert len(ora1) == len(ora2) == 16  # %5 subset of 80
    nz1 = nz2 = 0
    for d in range(0, 80, 5):
        g1 = m.decode_layer1_pcm(encode_layer1(d))
        g2 = m.decode_layer2_pcm(encode_layer2(d))
        for c in ("n_frames", "sample_rate", "n_pcm", "n_pcm_nz",
                  "sum_pcm_fp", "sum_abs_pcm_fp", "sum_pcm_w_fp"):
            assert int(ora1.loc[d, c]) == int(g1[c]), ("L1", d, c)
            assert int(ora2.loc[d, c]) == int(g2[c]), ("L2", d, c)
        assert int(ora2.loc[d, "sblimit"]) == int(g2["sblimit"])
        nz1 += g1["n_pcm_nz"]
        nz2 += g2["n_pcm_nz"]
    assert nz1 > 0 and nz2 > 0

    # (b) fixed-point subband samples track the float decode
    for d in (3, 17, 44):
        d1 = decode_layer1(encode_layer1(d))
        fp = d1["subband_samples_fp"][:, :, 0] / 2.0**28
        assert np.abs(fp - d1["subband_samples"]).max() <= 2.0**-27
        d2 = decode_layer2(encode_layer2(d))
        fp2 = d2["subband_samples_fp"][:, :, 0] / 2.0**28
        assert np.abs(fp2 - d2["subband_samples"]).max() <= 2.0**-27

    # (c) shared filterbank semantics
    assert m.decode_layer2_pcm.__module__ == m.decode_mp3_pcm.__module__
    zero = np.zeros((24, 32), dtype=np.int64)
    assert (m.synthesis_pcm(zero) == 0).all()
    # SF_FP is floor(2 * 2^(-idx/3) * 2^28): spot-check the dyadic rows
    assert SF_FP[0] == 2 << 28 and SF_FP[3] == 1 << 28 and SF_FP[6] == 1 << 27


def test_mp3_stereo_pcm_channel_exactness_and_oracle():
    """Stereo Layer III to PCM: (a) the stereo chain's aggregates equal
    the SUM of the mono chain at the two virtual docs — channel
    EXACTNESS through symbol decode, requantization, IMDCT, overlap
    state, and synthesis (a cross-channel overlap or FIFO leak breaks
    this); (b) the registered SQL oracle (mono replay at virtual ids,
    regrouped) reproduces the decode BIT-EXACTLY."""
    import duckdb

    from cobradb_spark.operators.mp3huff import (
        encode_mp3_main,
        encode_mp3_stereo,
        mp3_stereo_virtual_docs,
    )
    from cobradb_spark.operators.mp3imdct import (
        decode_mp3_pcm,
        decode_mp3_stereo_pcm,
    )
    from cobradb_spark.registry import get_query

    cols = ("n_pcm", "n_pcm_nz", "sum_pcm_fp", "sum_abs_pcm_fp", "sum_pcm_w_fp")
    for d in (0, 7, 23, 101, 250):
        st = decode_mp3_stereo_pcm(encode_mp3_stereo(d))
        v0, v1 = mp3_stereo_virtual_docs(d)
        m0 = decode_mp3_pcm(encode_mp3_main(v0))
        m1 = decode_mp3_pcm(encode_mp3_main(v1))
        for k in cols:
            assert st[k] == m0[k] + m1[k], (d, k)
        assert st["n_frames"] == m0["n_frames"] == m1["n_frames"]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM range(0, 60) t(doc_id)")
    ora = (
        con.execute(get_query("multimodal_mp3_stereo_pcm_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    assert len(ora) == 6  # %10 subset
    for d in range(0, 60, 10):
        got = decode_mp3_stereo_pcm(encode_mp3_stereo(d))
        for k in ("n_frames", "sample_rate", *cols):
            assert int(ora.loc[d, k]) == int(got[k]), (d, k)


def test_mp3_joint_stereo_ms_intensity_semantics_and_oracle():
    """Joint-stereo processing (operators/mp3stereo.py): (a) the
    registered SQL oracle reproduces the decode BIT-EXACTLY over a
    bare doc range; (b) MS frames genuinely mix (L/R differ from M/S
    and reconstruct M,S within fixed-point tolerance: (L+R)/sqrt(2)
    ~ M); (c) intensity frames move energy INTO the right channel's
    zero region (R nonzero above nzend_r) and split by the is_pos
    ratio within tolerance, with is_pos 6 putting everything left;
    (d) the fixture covers all three mode_extension values and is_pos
    0..7; (e) the strict general decoder still REJECTS mode_ext != 0
    while decode_mp3_main_joint accepts."""
    import duckdb
    import numpy as np

    from cobradb_spark.operators import mp3stereo as st
    from cobradb_spark.operators.mp3huff import (
        SFB_LONG,
        decode_mp3_main_general,
        decode_mp3_main_joint,
        encode_mp3_jstereo,
    )
    from cobradb_spark.operators.mp3imdct import decode_mp3_joint_pcm
    from cobradb_spark.operators.mp3requant import requantize_lines
    from cobradb_spark.registry import get_query

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM range(90, 140) t(doc_id)")
    ora = (
        con.execute(get_query("multimodal_mp3_joint_pcm_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    for d in range(90, 140, 10):
        got = decode_mp3_joint_pcm(encode_mp3_jstereo(d))
        for k in ("n_frames", "sample_rate", "n_pcm", "n_pcm_nz",
                  "sum_pcm_fp", "sum_abs_pcm_fp", "sum_pcm_w_fp"):
            assert int(ora.loc[d, k]) == int(got[k]), (d, k)

    exts_seen, ispos_seen = set(), set()
    ms_checked = is_checked = 0
    for d in range(90, 130):  # gg = (2d+ch+g)%256 ~ 180-255: loud
        dec = decode_mp3_main_joint(encode_mp3_jstereo(d))
        sr = dec["sample_rate"]
        edges = SFB_LONG[sr]
        raw = requantize_lines(dec)
        mixed = st.joint_stereo_lines(dec)
        recs = {(g["frame"], g["granule"], g["ch"]): g for g in dec["granules"]}
        by_key = {}
        for idx, r in enumerate(raw):
            by_key.setdefault((r["frame"], r["granule"]), {})[r["ch"]] = idx
        for (f, g), chs in by_key.items():
            gr_r = recs[(f, g, 1)]
            ext = recs[(f, g, 0)]["mode_ext"]
            exts_seen.add(ext)
            m = raw[chs[0]]["xr_fp"].astype(np.float64)
            s = raw[chs[1]]["xr_fp"].astype(np.float64)
            lo = mixed[chs[0]]["xr_fp"].astype(np.float64)
            ro = mixed[chs[1]]["xr_fp"].astype(np.float64)
            nz_r = len(gr_r["values"])
            isb = np.zeros(576, dtype=bool)
            if ext & 1:
                for b in range(22):
                    if edges[b] >= nz_r:
                        p = gr_r["scalefacs"][min(b, 20)]
                        ispos_seen.add(p)
                        if p != 7:
                            isb[edges[b] : edges[b + 1]] = True
            # joint_stereo_lines scales the whole stream down by the
            # headroom bit (mp3stereo module docstring) — undo it for
            # the semantic reconstructions, with floor-error slack
            hd = 1 << st.JOINT_HEADROOM_BITS
            if ext & 2 and np.abs(m[~isb]).max() > 1e6:
                # MS reconstructs: (L+R)*hd/sqrt2 ~ M, (L-R)*hd/sqrt2 ~ S
                rec_m = (lo[~isb] + ro[~isb]) * hd / np.sqrt(2.0)
                assert np.abs(rec_m - m[~isb]).max() <= 4 * hd + 1e-5 * np.abs(m[~isb]).max()
                ms_checked += 1
            if isb.any() and np.abs(m[isb]).max() > 1e6:
                assert (s[isb] == 0).all()  # intensity region IS r's zero part
                # energy split tracks tan ratios; right channel gains signal
                k = (np.abs(ro[isb]).sum() + np.abs(lo[isb]).sum()) * hd
                assert abs(k - np.abs(m[isb]).sum()) <= 4 * hd * isb.sum() + 0.061 * k
                is_checked += 1
    assert exts_seen == {1, 2, 3}
    assert ispos_seen == set(range(8))
    assert ms_checked > 0 and is_checked > 0

    # regression (round-12 advice): joint-mixed spectra exceed the mono
    # |xr| bound by sqrt(2), which without the headroom bit pushes the
    # IMDCT z-stage raw sum past the oracle's -2^62 offset-form floor-
    # division domain.  Assert the post-headroom spectra keep the
    # WORST-CASE z raw sum (18 lines * 2^18 window scale * max|a1|,
    # |a1| <= 1.3867 * |a0|) strictly inside the domain, doc by doc.
    max_xr = 0
    for d in range(90, 140):
        for rec in st.joint_stereo_lines(decode_mp3_main_joint(encode_mp3_jstereo(d))):
            max_xr = max(max_xr, int(np.abs(rec["xr_fp"]).max()))
    assert max_xr <= 1.06e13  # the documented mono-chain |xr| bound
    worst_z_raw = 18 * (1 << 18) * int(1.3867 * (max_xr >> 4) + 1)
    assert worst_z_raw < 1 << 62

    data = encode_mp3_jstereo(97)
    try:
        decode_mp3_main_general(data)
        raise AssertionError("strict decode must reject mode_extension != 0")
    except ValueError as e:
        assert "mode_extension" in str(e)

    # regression (round-11 review): a flipped scfsi bit makes granule 1
    # transmit FEWER scalefactors; is_pos must read the scfsi-EFFECTIVE
    # list (clean decode or ValueError), never misindex the raw one.
    b = bytearray(encode_mp3_jstereo(123))
    crashes = 0
    for pos in range(4, 36):  # both side-info scfsi regions
        for bit in range(8):
            bb = bytearray(b)
            bb[pos] ^= 1 << bit
            try:
                decode_mp3_joint_pcm(bytes(bb))
            except (ValueError, NotImplementedError):
                pass
            except Exception:
                crashes += 1
    assert crashes == 0


def test_mp3_joint_pcm_fuzz_never_crashes():
    """Mutation fuzz through the joint-stereo chain: flip one byte in a
    valid joint stream — decode_mp3_joint_pcm must either raise
    ValueError/NotImplementedError (a flip can fabricate a
    window-switching granule, whose intensity handling is the
    documented sub-boundary) or return well-formed aggregates with the
    documented int64 headroom."""
    import numpy as np

    from cobradb_spark.operators.mp3huff import encode_mp3_jstereo
    from cobradb_spark.operators.mp3imdct import decode_mp3_joint_pcm

    base = bytearray(encode_mp3_jstereo(123))
    rng = np.random.default_rng(1231)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(200):
        b = bytearray(base)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_mp3_joint_pcm(bytes(b))
            assert out["n_pcm"] == 2 * 36 * out["n_frames"] * 32
            assert 0 <= out["n_pcm_nz"] <= out["n_pcm"]
            assert abs(out["sum_pcm_fp"]) <= out["sum_abs_pcm_fp"] < 1 << 62
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["rejected"] += 1
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_mp3_joint_short_per_window_intensity_and_oracle():
    """Short-granule joint stereo: (a) the registered oracle reproduces
    the decode BIT-EXACTLY over a bare doc range; (b) per-WINDOW
    intensity: within one short band, windows on opposite sides of the
    right channel's zero boundary get different treatment, and the
    energy split follows each window's OWN is_pos; (c) channel
    block-type mismatch in a joint frame rejects; (d) fuzz: byte flips
    never crash the short-joint chain."""
    import duckdb
    import numpy as np

    from cobradb_spark.operators import mp3stereo as st
    from cobradb_spark.operators.mp3huff import (
        decode_mp3_main_joint,
        encode_mp3_jstereo_short,
    )
    from cobradb_spark.operators.mp3imdct import decode_mp3_joint_pcm
    from cobradb_spark.operators.mp3requant import SFB_SHORT, requantize_lines
    from cobradb_spark.registry import get_query

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM range(100, 160) t(doc_id)")
    ora = (
        con.execute(get_query("multimodal_mp3_joint_short_pcm_decode").oracle)
        .df().set_index("doc_id").sort_index()
    )
    for d in range(100, 160, 10):
        got = decode_mp3_joint_pcm(encode_mp3_jstereo_short(d))
        for k in ("n_frames", "sample_rate", "n_pcm", "n_pcm_nz",
                  "sum_pcm_fp", "sum_abs_pcm_fp", "sum_pcm_w_fp"):
            assert int(ora.loc[d, k]) == int(got[k]), (d, k)

    # (b) per-window semantics on a loud doc
    boundary_windows = 0
    for d in range(100, 140):
        dec = decode_mp3_main_joint(encode_mp3_jstereo_short(d))
        sr = dec["sample_rate"]
        edges = SFB_SHORT[sr]
        raw = requantize_lines(dec)
        mixed = st.joint_stereo_lines(dec)
        recs = {(g["frame"], g["granule"], g["ch"]): g for g in dec["granules"]}
        by_key = {}
        for idx, r in enumerate(raw):
            by_key.setdefault((r["frame"], r["granule"]), {})[r["ch"]] = idx
        for (f, g), chs in by_key.items():
            gr_r = recs[(f, g, 1)]
            ext = recs[(f, g, 0)]["mode_ext"]
            if not ext & 1:
                continue
            nz_r = len(gr_r["values"])
            m = raw[chs[0]]["xr_fp"]
            lo_out = mixed[chs[0]]["xr_fp"]
            ro_out = mixed[chs[1]]["xr_fp"]
            for b in range(13):
                width = edges[b + 1] - edges[b]
                base = 3 * edges[b]
                starts = [base + w * width for w in range(3)]
                inten = [lo >= nz_r for lo in starts]
                if any(inten) and not all(inten):
                    boundary_windows += 1  # zero boundary cuts INSIDE band b
                for w in range(3):
                    lo, hi = starts[w], starts[w] + width
                    if not inten[w]:
                        continue
                    p = gr_r["scalefacs"][3 * min(b, 11) + w]
                    if p == 7 or not np.abs(m[lo:hi]).max():
                        continue
                    # mix result carries the stream-wide headroom shift
                    # (floor composes: mix // 2^h is exactly what the
                    # chain stores)
                    hd = 1 << st.JOINT_HEADROOM_BITS
                    exp_l = ((m[lo:hi] * st.ILR_FP[p]) // st.FP_ONE) // hd
                    exp_r = ((m[lo:hi] * st.IRR_FP[p]) // st.FP_ONE) // hd
                    assert (lo_out[lo:hi] == exp_l).all(), (d, f, g, b, w)
                    assert (ro_out[lo:hi] == exp_r).all(), (d, f, g, b, w)
    assert boundary_windows > 0  # the fixture genuinely splits bands

    # (d) fuzz
    base = bytearray(encode_mp3_jstereo_short(117))
    rng = np.random.default_rng(1170)
    rejected = ok = 0
    for _ in range(150):
        bb = bytearray(base)
        bb[int(rng.integers(0, len(bb)))] ^= int(rng.integers(1, 256))
        try:
            out = decode_mp3_joint_pcm(bytes(bb))
            assert abs(out["sum_pcm_fp"]) <= out["sum_abs_pcm_fp"] < 1 << 62
            ok += 1
        except (ValueError, NotImplementedError):
            rejected += 1
    assert ok > 0 and rejected > 0
