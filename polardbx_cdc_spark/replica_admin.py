"""MySQL-compatible replication admin command surface: CHANGE MASTER TO,
CHANGE REPLICATION FILTER, START/STOP/RESET SLAVE, SHOW SLAVE STATUS —
all with ``FOR CHANNEL`` support.

Reference: RplServiceManager
(polardbx-cdc-rpl/.../taskmeta/RplServiceManager.java — startSlave:66,
stopSlave:88, resetSlave:105 [ALL vs history-only rules :111-114],
changeMaster:214 [running-slave guard :220, position from
MASTER_LOG_FILE:MASTER_LOG_POS :254-257], REPLICATE_* param wiring
:404-445, showSlaveStatus:139) and the FSM states in FSMMetaManager.
The reference keeps channel state in MetaDB tables and launches daemon
task chains; here a channel is a config record and "running" means its
filters/position are applied to the CDC DataFrame on demand — Spark's DAG
is the task chain (SURVEY §2.12).

Command strings are parsed with small regexes (the surface is fixed
key=value grammar, not general SQL — same shape the reference gets after
its own parseRequest)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from polardbx_cdc_spark.operators.filters import (
    ReplicaFilterConfig,
    min_tso_filter,
    replica_filter,
)

#: RplServiceManager.java:55-57
RUNNING_SLAVE_ERROR = (
    "please ensure the replica is not running; run STOP SLAVE (FOR CHANNEL ...) first"
)

# FSM surface states (taskmeta FSMState reduced to the admin view)
DOWN, RUNNING, STOPPED = "DOWN", "RUNNING", "STOPPED"


@dataclass
class ReplicaChannel:
    name: str
    state: str = DOWN
    master_host: str = ""
    master_port: int = 3306
    #: start position as "file:pos" in the reference; our position space is
    #: the TSO (changeMaster:254-257 builds file:pos, we keep the TSO form)
    position: str = ""
    filter: ReplicaFilterConfig = field(default_factory=ReplicaFilterConfig)
    last_error: str = ""


def _split_csv(body: str) -> list[str]:
    return [p.strip().strip("'\"`") for p in body.split(",") if p.strip()]


class ReplicaAdmin:
    """Channelized replica FSM + command dispatcher."""

    def __init__(self) -> None:
        self.channels: dict[str, ReplicaChannel] = {}

    # -- helpers ----------------------------------------------------------
    def _channel_of(self, sql: str) -> str | None:
        m = re.search(r"FOR\s+CHANNEL\s+'?([A-Za-z0-9_.-]+)'?", sql, re.I)
        return m.group(1) if m else None

    def _targets(self, name: str | None) -> list[ReplicaChannel]:
        if name is not None:
            return [self.channels[name]] if name in self.channels else []
        return list(self.channels.values())

    def _get_or_create(self, name: str | None) -> ReplicaChannel:
        name = name or ""  # the default (unnamed) channel, as in MySQL
        if name not in self.channels:
            self.channels[name] = ReplicaChannel(name=name)
        return self.channels[name]

    # -- command surface --------------------------------------------------
    def execute(self, sql: str) -> list[tuple]:
        """Dispatch one admin command; returns rows for SHOW commands,
        ``[]`` otherwise. Raises ValueError with the reference's
        running-slave guard message where the reference refuses."""
        s = sql.strip().rstrip(";")
        chan = self._channel_of(s)
        head = s.upper()
        if head.startswith("CHANGE MASTER TO"):
            return self._change_master(s, chan)
        if head.startswith("CHANGE REPLICATION FILTER"):
            return self._change_filter(s, chan)
        if head.startswith("START SLAVE") or head.startswith("START REPLICA"):
            for c in self._targets(chan) or [self._get_or_create(chan)]:
                c.state = RUNNING
            return []
        if head.startswith("STOP SLAVE") or head.startswith("STOP REPLICA"):
            for c in self._targets(chan):
                c.state = STOPPED
            return []
        if head.startswith("RESET SLAVE") or head.startswith("RESET REPLICA"):
            return self._reset(s, chan)
        if head.startswith("SHOW SLAVE STATUS") or head.startswith("SHOW REPLICA STATUS"):
            return [
                (
                    c.name,
                    c.state,
                    c.master_host,
                    c.master_port,
                    c.position,
                    ",".join(c.filter.do_dbs),
                    ",".join(c.filter.ignore_dbs),
                    ",".join(c.filter.wild_do_tables),
                    ",".join(c.filter.wild_ignore_tables),
                    ",".join(f"({s}->{d})" for s, d in c.filter.rewrite_dbs.items()),
                    c.last_error,
                )
                for c in sorted(self._targets(chan), key=lambda c: c.name)
            ]
        raise ValueError(f"unsupported admin command: {sql!r}")

    def _guard_not_running(self, chan: str | None) -> None:
        # changeMaster/resetSlave refuse while running (RplServiceManager:220,117)
        for c in self._targets(chan):
            if c.state == RUNNING:
                raise ValueError(RUNNING_SLAVE_ERROR)

    def _change_master(self, s: str, chan: str | None) -> list[tuple]:
        self._guard_not_running(chan)
        c = self._get_or_create(chan)
        kv = dict(re.findall(r"(\w+)\s*=\s*'?([^,'\s]+)'?", s))
        up = {k.upper(): v for k, v in kv.items()}
        if "MASTER_HOST" in up or "SOURCE_HOST" in up:
            c.master_host = up.get("MASTER_HOST", up.get("SOURCE_HOST", ""))
            # a new master resets the saved position unless one is given
            # (changeMaster:291-296)
            c.position = ""
        if "MASTER_PORT" in up or "SOURCE_PORT" in up:
            c.master_port = int(up.get("MASTER_PORT", up.get("SOURCE_PORT", "3306")))
        if "MASTER_TSO" in up:  # our position space
            c.position = up["MASTER_TSO"]
        elif "MASTER_LOG_FILE" in up and "MASTER_LOG_POS" in up:
            c.position = f"{up['MASTER_LOG_FILE']}:{up['MASTER_LOG_POS']}"
        return []

    def _change_filter(self, s: str, chan: str | None) -> list[tuple]:
        self._guard_not_running(chan)
        c = self._get_or_create(chan)
        for key, body in re.findall(r"(REPLICATE_\w+)\s*=\s*\(([^)]*)\)", s, re.I):
            vals = _split_csv(body)
            k = key.upper()
            if k == "REPLICATE_DO_DB":
                c.filter.do_dbs = vals
            elif k == "REPLICATE_IGNORE_DB":
                c.filter.ignore_dbs = vals
            elif k == "REPLICATE_DO_TABLE":
                c.filter.do_tables = vals
            elif k == "REPLICATE_IGNORE_TABLE":
                c.filter.ignore_tables = vals
            elif k == "REPLICATE_WILD_DO_TABLE":
                c.filter.wild_do_tables = vals
            elif k == "REPLICATE_WILD_IGNORE_TABLE":
                c.filter.wild_ignore_tables = vals
            elif k == "REPLICATE_REWRITE_DB":
                # ((src, dst)) pairs, MySQL style: (a,b) means a->b
                pair = vals
                if len(pair) == 2:
                    c.filter.rewrite_dbs[pair[0]] = pair[1]
            else:
                raise ValueError(f"unsupported replication filter: {key}")
        return []

    def _reset(self, s: str, chan: str | None) -> list[tuple]:
        # RESET SLAVE [ALL] [FOR CHANNEL]: ALL removes the channel entirely,
        # plain RESET clears history/position only (RplServiceManager:111-114)
        self._guard_not_running(chan)
        is_all = re.search(r"\bALL\b", s, re.I) is not None
        for c in self._targets(chan):
            if is_all:
                del self.channels[c.name]
            else:
                c.position = ""
                c.last_error = ""
        return []

    # -- data plane -------------------------------------------------------
    def apply(self, df: DataFrame, channel: str = "") -> DataFrame:
        """The channel's view of the CDC stream: position seek + replication
        filters — exactly what the reference's extractor chain applies for a
        REPLICA_INC task. Raises unless the channel is RUNNING."""
        c = self.channels.get(channel)
        if c is None or c.state != RUNNING:
            raise ValueError(f"channel {channel!r} is not running")
        out = df
        if c.position:
            out = min_tso_filter(out, c.position)
        return replica_filter(out, c.filter)

    def show_status_df(self, spark: SparkSession, channel: str | None = None) -> DataFrame:
        rows = self.execute(
            "SHOW SLAVE STATUS" + (f" FOR CHANNEL '{channel}'" if channel else "")
        )
        return spark.createDataFrame(
            rows or [],
            "channel string, state string, master_host string, master_port int, "
            "position string, do_db string, ignore_db string, wild_do_table string, "
            "wild_ignore_table string, rewrite_db string, last_error string",
        )
