"""Oracle-type gate: every oracle_sql() entry must parse in DuckDB and
must not produce a HUGEINT (int128) column.

Round-3 lesson: the driver's value-hash serializes DuckDB HUGEINT
differently from BIGINT, so an un-CAST ``sum(...)`` fails the grade with
rows_match and schema_match both true (cdc_disorder_report,
events_sessionize, media_stats in CORRECTNESS_r03.json). DuckDB
``sum(INTEGER/BIGINT)`` returns HUGEINT; the determinism rules in
``queries.py`` mandate ``CAST(... AS BIGINT)``. This gate makes the whole
class unrepresentable, the same way test_package_imports.py gates the
round-2 import-failure class.

Runs the oracles for real on sf0.001 (sub-second each) so type inference
is exact, not parse-time guessed.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.oracle_compare import duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# DuckDB type names that the driver's hash serializes differently from
# their "natural" Spark twins. HUGEINT is the proven offender; UHUGEINT
# would hit the same path.
FORBIDDEN_TYPES = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_parses_and_no_hugeint(con, name):
    sql = _oracles()[name]
    res = con.execute(sql)
    # Materialize so type inference reflects the executed result.
    res.fetchall()
    bad = [
        (col[0], str(col[1]))
        for col in res.description
        if str(col[1]).upper() in FORBIDDEN_TYPES
    ]
    assert not bad, (
        f"oracle {name!r} produces driver-hash-unstable column types {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT) (see queries.py determinism rules)"
    )
