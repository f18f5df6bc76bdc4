"""polardbx_cdc_spark — a PySpark-native analytics/stream-processing engine
with the query and data-processing capabilities of the reference CDC system
(strongduanmu/polardbx-cdc), re-expressed Spark-first.

The spine of the engine is one canonical CDC event DataFrame (see
``model.py``); every reference operator (filters, TSO merge, transaction
reassembly, last-image dedup, appliers, routing, validation, flashback) is a
``DataFrame -> DataFrame`` transform over that spine, shared between batch
and Structured Streaming.
"""

__version__ = "0.1.0"

from polardbx_cdc_spark.session import get_spark  # noqa: F401
