"""Oracle-differential tests for the relational query surface."""

import pytest

from tests.conftest import assert_df_matches_sql, assert_query_matches_oracle

RELATIONAL = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_nation_revenue",
    "topk_orders",
    "cube_status_priority",
    "orders_above_customer_avg",
    "q14_promo_revenue",
    "customer_order_counts_outer",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)


def test_rollup_matches_oracle(spark):
    """rollup_order_status is consolidated out of the 50-row driver window
    (cube's groupings subsume rollup's) but the ROLLUP API keeps the same
    oracle-differential bar here."""
    from tests.conftest import SF_DIR_ORACLE
    from mega_data_factory_spark.plans.relational import ROLLUP_ORACLE, rollup_order_status

    assert_df_matches_sql(
        rollup_order_status(spark, SF_DIR_ORACLE), ROLLUP_ORACLE, name="rollup_order_status"
    )
