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
