"""Oracle-differential tests for the curation operator surface."""

import pytest

from tests.conftest import assert_query_matches_oracle

CURATION = [
    "text_length_filter",
    "curation_funnel_by_source",
    "text_exact_dedup",
    "orders_first_per_customer",
    "orders_dedup_rejected",
    "docs_token_stats",
    "text_analysis",
    "url_rule_filters",
    "curation_pipeline",
    "curation_rejection_summary",
]


@pytest.mark.parametrize("name", CURATION)
def test_curation_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)
