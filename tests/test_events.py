"""Oracle-differential tests for event-stream analytics."""

import pytest

from tests.conftest import assert_query_matches_oracle

EVENTS = [
    "events_hourly_agg",
    "events_sessionize",
    "events_first_per_user_type",
    "events_json_props",
]


@pytest.mark.parametrize("name", EVENTS)
def test_events_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)


def test_type_stats_matches_oracle(spark):
    """Consolidated out of the driver window (its stat families are
    driver-covered by q1/events_hourly_agg/column_profile) but the
    differential bar stays: per-type counts, decimal sums, distinct
    users, and exact interpolated percentiles vs DuckDB."""
    from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql
    from mega_data_factory_spark.plans.events import TYPE_STATS_ORACLE, events_type_stats

    # SF_DIR_ORACLE on BOTH sides: assert_df_matches_sql registers its
    # DuckDB views over the same env-overridable dir
    out = events_type_stats(spark, SF_DIR_ORACLE)
    assert_df_matches_sql(out, TYPE_STATS_ORACLE, name="events_type_stats")


def test_approx_distinct_within_tolerance(spark):
    """HLL++ approx_count_distinct at rsd=0.02 stays within 5% of exact."""
    from tests.conftest import SF_DIR_ORACLE
    from mega_data_factory_spark.plans.events import events_user_approx_distinct

    rows = events_user_approx_distinct(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= 0.05 * r.exact_users, r
