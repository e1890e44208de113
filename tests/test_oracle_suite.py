"""Every declared query hash-matches its DuckDB oracle at smoke scale.

This mirrors the driver's correctness gate (see tools/oracle_check.py) so a
regression is caught before the round boundary.
"""

from __future__ import annotations

import pytest

from connected_data_lake_spark.plans import all_specs
from tools.oracle_check import check_spec

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    res = check_spec(spark, duck, SPECS[name], sf_dir)
    assert res.ok, f"{name}: {res.detail}"


def test_all_queries_have_unique_names():
    assert len(SPECS) == len(set(SPECS))


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 50
