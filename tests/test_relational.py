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


def test_q14_matches_oracle(spark):
    """q14_promo_revenue is consolidated out of the driver window (its
    single-row conditional decimal aggregate is subsumed by q1's decimal
    family) but keeps the oracle-differential bar here."""
    from tests.conftest import SF_DIR_ORACLE
    from mega_data_factory_spark.plans.relational import Q14_ORACLE, q14_promo_revenue

    assert_df_matches_sql(
        q14_promo_revenue(spark, SF_DIR_ORACLE), Q14_ORACLE, name="q14_promo_revenue"
    )


def test_outer_counts_matches_oracle(spark):
    """customer_order_counts_outer is consolidated out of the driver window
    (the customer⋈orders LEFT JOIN family stays covered there by
    customer_order_ranks / customer_semi_anti_join) but keeps the
    oracle-differential bar here."""
    from tests.conftest import SF_DIR_ORACLE
    from mega_data_factory_spark.plans.relational import (
        OUTER_COUNTS_ORACLE,
        customer_order_counts_outer,
    )

    assert_df_matches_sql(
        customer_order_counts_outer(spark, SF_DIR_ORACLE),
        OUTER_COUNTS_ORACLE,
        name="customer_order_counts_outer",
    )
