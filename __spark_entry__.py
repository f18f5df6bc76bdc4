"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL for the correctness gate.

All definitions live in ``polardbx_cdc_spark.queries``; this module is the
thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:  # loadable from any cwd
    sys.path.insert(0, _REPO_ROOT)

from polardbx_cdc_spark import queries as Q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the complete replica pipeline in one DataFrame plan —
    source → accept/blacklist/replica filters + db rewrite → last-image
    merge → rendered downstream DML (SURVEY §3.3)."""
    return Q.cdc_full_pipeline(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
