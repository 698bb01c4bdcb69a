"""Driver-contract guards on the query registry."""

from mega_data_factory_spark.plans import all_oracles, all_queries

DRIVER_ROW_CAP = 50  # the driver records CORRECTNESS rows for the first 50 only


def test_registry_fits_driver_window():
    qs = all_queries()
    assert len(qs) <= DRIVER_ROW_CAP, (
        f"{len(qs)} queries registered; the driver checks only the first "
        f"{DRIVER_ROW_CAP} — consolidate (merge near-duplicates) before adding more"
    )


def test_every_oracle_has_a_query():
    qs, ors = all_queries(), all_oracles()
    dangling = set(ors) - set(qs)
    assert not dangling, f"oracles without a query: {sorted(dangling)}"


def test_no_duplicate_query_names_across_modules():
    from mega_data_factory_spark.plans import _modules

    seen: dict[str, str] = {}
    for m in _modules():
        for name in m.QUERIES:
            assert name not in seen, f"{name} registered by both {seen[name]} and {m.__name__}"
            seen[name] = m.__name__


def test_retired_queries_stay_runnable_and_disjoint():
    """Rotation contract: a retired query keeps its (query, oracle) pair —
    the pytest differential bar — and never shadows a live registration."""
    from mega_data_factory_spark.plans import retired_oracles, retired_queries

    rq, ro = retired_queries(), retired_oracles()
    assert set(rq) == set(ro), "every retired query needs its oracle (and vice versa)"
    live = set(all_queries())
    assert not (set(rq) & live), f"retired queries shadowing live ones: {sorted(set(rq) & live)}"
