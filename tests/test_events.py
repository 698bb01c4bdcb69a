"""Oracle-differential tests for event-stream analytics."""

import pytest

from tests.conftest import assert_query_matches_oracle

EVENTS = [
    "events_hourly_agg",
    "events_sessionize",
    "events_type_stats",
    "events_top_users",
    "events_first_per_user_type",
    "events_json_props",
]


@pytest.mark.parametrize("name", EVENTS)
def test_events_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)
