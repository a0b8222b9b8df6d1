"""Every registered query with an oracle must hash-match it at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

import pytest

from customer_churn_prediction_spark.plans import get_oracles, get_queries

from .oracle_utils import assert_matches_oracle

_QUERIES = get_queries()
_ORACLES = get_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(name, spark, sf_dir):
    assert_matches_oracle(_QUERIES[name](spark, sf_dir), _ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
