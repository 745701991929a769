"""Physical-plan assertions (SURVEY.md §5.3): filters push into
parquet scans, small dims broadcast, no cartesian products anywhere
in the §2 inventory. These are the properties that keep the same
plans viable at 100 TB."""

import pytest

from github_issues_lakehouse_spark import queries as Q
from github_issues_lakehouse_spark.operators import relational as R
from github_issues_lakehouse_spark.plans import (
    assert_no_cartesian,
    broadcast_join_count,
    has_pushed_filters,
)

from .conftest import SF_DIR


def test_q1_filter_pushdown(spark):
    df = R.q1_pricing_summary(spark, SF_DIR)
    assert has_pushed_filters(df), "l_shipdate filter must reach the parquet scan"


def test_q3_broadcasts_customer_dim(spark):
    df = R.q3_shipping_priority(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1


def test_q5_broadcasts_dims(spark):
    df = R.q5_region_revenue(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2, "nation/region/supplier should broadcast"


@pytest.mark.parametrize("name", sorted(Q.queries()))
def test_no_cartesian_product(name, spark):
    df = Q.queries()[name](spark, SF_DIR)
    assert_no_cartesian(df)
