"""cobradb_spark.plans — the public plan-gating API (SURVEY §4.2's audit
checks, exposed for user pipelines)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cobradb_spark.plans import PlanAssertionError, assert_scale_safe, plan_summary


def test_plan_summary_detects_broadcast_and_pushdown(spark, sf_dir):
    from cobradb_spark.queries.flagship import join_topn

    s = plan_summary(join_topn(spark, sf_dir))
    assert s.broadcast_hash_joins >= 2  # nation + region dims
    assert s.take_ordered == 1  # top-10 heap, not a global sort
    assert s.read_schemas  # column pruning visible at the scans
    assert s.cartesian_products == 0


def test_assert_scale_safe_passes_good_plan(spark, sf_dir):
    from cobradb_spark.queries.flagship import join_topn

    assert_scale_safe(join_topn(spark, sf_dir), forbid_nested_loop=True)


def test_assert_scale_safe_flags_global_window(spark, sf_dir):
    """The classic 100 TB mistake — row_number() with no partitionBy —
    must be caught as a single-partition funnel."""
    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    with pytest.raises(PlanAssertionError, match="single-partition"):
        assert_scale_safe(df)


def test_assert_scale_safe_flags_cartesian(spark):
    a, b = spark.range(10), spark.range(10)
    df = a.crossJoin(b.withColumnRenamed("id", "id2"))
    with pytest.raises(PlanAssertionError, match="Cartesian|NestedLoop"):
        assert_scale_safe(df, forbid_nested_loop=True)


def test_scalar_aggregate_allowance(spark, sf_dir):
    """A 1-row global aggregate legitimately plans one SinglePartition
    exchange — the documented opt-in."""
    from cobradb_spark.io import load_table

    df = load_table(spark, sf_dir, "orders").agg(F.sum("o_totalprice"))
    with pytest.raises(PlanAssertionError):
        assert_scale_safe(df)
    assert_scale_safe(df, max_single_partition_exchanges=1)
