"""Consumer-group semantics over the CDC feed — offset commit, rebalance,
generation fencing.

Reference parity: the RPL extractor subscribes to the global binlog stream
and persists its resume position (CdcExtractor.java:87,225 — ``dump(
DumpRequest{fileName, position})``; position persistence via the task-meta
tables that rpl/taskmeta/* manage). A real deployment fronts the feed with
a broker; this module implements the CONTRACT a Kafka-style consumer group
provides — durable committed offsets per (group, topic), cooperative
range rebalance on membership change, at-least-once redelivery after a
crash, and zombie fencing by generation — with the broker's coordinator
state kept as an atomically-swapped JSON file. Swapping in a real broker
replaces the transport; every semantic tested here carries over.

Scale notes: the offset store is O(#topics) metadata — driver-side by
design (Kafka's coordinator is a metadata service too). The data path
stays a Spark stream: assignment and seek positions compile to Catalyst
filters (``source_id IN (...) AND tso > committed``), which push down to
the scan/broker rather than discarding rows post-read.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StaleGenerationError(RuntimeError):
    """A commit from a fenced (pre-rebalance) member was rejected."""


class ConsumerGroup:
    """Durable consumer-group coordinator state.

    State file layout (atomic tmp+rename swap, crash-safe):
    ``{"generation": N, "members": [...], "offsets": {topic: tso}}``.

    Semantics (the Kafka contract):

    - ``join``/``leave`` bump the GENERATION and recompute the range
      assignment over sorted topics × sorted members.
    - ``commit`` is max-merge per topic and carries the committing
      member's generation: a commit from an older generation raises
      :class:`StaleGenerationError` (zombie fencing — a paused/partitioned
      consumer that missed a rebalance cannot clobber offsets).
    - offsets only advance (max-merge), so replays after a crash
      re-deliver AT LEAST once and never lose acknowledged positions.
    """

    def __init__(self, group_id: str, offsets_dir: str) -> None:
        self.group_id = group_id
        self.offsets_dir = offsets_dir
        os.makedirs(offsets_dir, exist_ok=True)

    # -- state persistence ---------------------------------------------------
    def _path(self) -> str:
        return os.path.join(self.offsets_dir, f"group-{self.group_id}.json")

    def _load(self) -> dict:
        try:
            with open(self._path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"generation": 0, "members": [], "offsets": {}}

    def _store(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.offsets_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._path())

    # -- membership / rebalance ----------------------------------------------
    def join(self, member_id: str) -> int:
        """Add a member; returns the NEW generation (the member's fence
        token). Idempotent for an already-joined member (no bump)."""
        state = self._load()
        if member_id not in state["members"]:
            state["members"].append(member_id)
            state["generation"] += 1
            self._store(state)
        return state["generation"]

    def leave(self, member_id: str) -> int:
        """Remove a member (graceful shutdown or coordinator-detected
        death); returns the new generation."""
        state = self._load()
        if member_id in state["members"]:
            state["members"].remove(member_id)
            state["generation"] += 1
            self._store(state)
        return state["generation"]

    def generation(self) -> int:
        return self._load()["generation"]

    def assignment(self, topics: list[str], member_id: str) -> list[str]:
        """Range assignment: sorted topics dealt round-robin over sorted
        members — deterministic, so every member computes the same split
        without coordination (Kafka's RangeAssignor shape)."""
        state = self._load()
        members = sorted(state["members"])
        if member_id not in members:
            raise KeyError(f"{member_id} has not joined group {self.group_id}")
        idx = members.index(member_id)
        return [t for i, t in enumerate(sorted(topics)) if i % len(members) == idx]

    # -- offsets ---------------------------------------------------------------
    def committed(self) -> dict[str, str]:
        return dict(self._load()["offsets"])

    def commit(self, offsets: dict[str, str], generation: int) -> None:
        """Max-merge commit, fenced by generation."""
        state = self._load()
        if generation < state["generation"]:
            raise StaleGenerationError(
                f"member generation {generation} < group generation "
                f"{state['generation']} — rebalanced away; re-join"
            )
        for topic, tso in offsets.items():
            cur = state["offsets"].get(topic, "")
            if tso > cur:
                state["offsets"][topic] = tso
        self._store(state)


def consume_cdc(
    spark: SparkSession,
    sf_dir: str,
    group: ConsumerGroup,
    member_id: str,
    topics: list[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """This member's share of the feed: assigned topics only, seeking past
    the group's committed offsets — both plain Catalyst predicates (pushed
    to the scan; on a broker they become the subscription + seek)."""
    from polardbx_cdc_spark.streaming.source import cdc_stream

    assigned = group.assignment(topics, member_id)
    committed = group.committed()
    stream = cdc_stream(spark, sf_dir, watermark=watermark).filter(
        F.col("source_id").isin(assigned)
    )
    if committed:
        wm = F.create_map(*[F.lit(x) for kv in committed.items() for x in kv])
        stream = stream.filter(
            F.col("tso") > F.coalesce(wm[F.col("source_id")], F.lit(""))
        )
    return stream
