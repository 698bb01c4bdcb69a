"""Oracle-differential tests for the relational query surface."""

import pytest

from tests.conftest import assert_query_matches_oracle

RELATIONAL = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_nation_revenue",
    "topk_orders",
    "rollup_order_status",
    "cube_status_priority",
    "orders_above_customer_avg",
    "q14_promo_revenue",
    "customer_order_counts_outer",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)
