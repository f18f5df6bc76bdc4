"""The main correctness gate, run locally: every query with an oracle must
hash-match DuckDB; oracle-less queries must at least execute and return a
stable schema."""

from __future__ import annotations

import pytest

from polardbx_cdc_spark import queries as Q
from tests.oracle_compare import compare, duck_connection

_QUERIES = Q.queries()
_ORACLES = Q.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(name, spark, sf_dir, duck):
    df = _QUERIES[name](spark, sf_dir)
    ok, detail = compare(df, duck, _ORACLES[name])
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0
