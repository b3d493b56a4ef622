"""Driver-style DuckDB oracle parity for every registered query that
declares an oracle — the same gate CORRECTNESS_r{N}.json applies at
sf0.01."""

import pytest

from k_means_in_mapreduce_spark import registry

from .conftest import SF001, assert_oracle_match


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(name, spark, duck_sf001):
    df = registry.QUERIES[name](spark, SF001)
    assert_oracle_match(df, registry.ORACLES[name], duck_sf001)


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_queries_run(name, spark):
    """Queries without an oracle must still run and return a stable schema."""
    df = registry.QUERIES[name](spark, SF001)
    assert df.columns
    assert df.count() >= 0
