"""RPL data-import state machine — the driver-side coordinator.

Reference: the import FSM walks FULL_COPY → INC_COPY →
CATCH_UP_VALIDATION → RECONCILIATION → (re-validate) → FINISHED
(rpl/common/fsmutil/FSMState.java:26-44, transition table
rpl/common/fsmutil/DataImportTransitions.java:34-94; state machine types
rpl/taskmeta/StateMachineType.java:21-30). In the reference each state is
a long-running task the daemon schedules; here each state is one Spark
job graph and the FSM is plain driver code — Spark's scheduler replaces
the daemon (SURVEY §2.12).

Stages are pluggable callables so the same machine drives the local
parquet harness and a JDBC target. The default wiring:

- FULL_COPY:   snapshot the source (``validation.full_copy_chunks``-style
  bulk read; FullCopyApplier semantics).
- INC_COPY:    apply the CDC delta on top (``apply.apply_to_snapshot`` —
  one last-image shuffle).
- CATCH_UP_VALIDATION: per-chunk checksums source vs replica
  (``validation.chunked_checksum`` shape, TableValidator).
- RECONCILIATION:      row-diff → repair DML (``validation
  .reconcile_repair``), applied to the replica; then validate again.

A validation failure bounces to RECONCILIATION at most ``max_repairs``
times — repeated failure is a hard error, matching the reference's FSM
refusing to finish a diverged import.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum


class State(str, Enum):
    FULL_COPY = "FULL_COPY"
    INC_COPY = "INC_COPY"
    CATCH_UP_VALIDATION = "CATCH_UP_VALIDATION"
    RECONCILIATION = "RECONCILIATION"
    FINISHED = "FINISHED"
    FAILED = "FAILED"


@dataclass
class ImportStateMachine:
    """Walks the import FSM. Stage callables receive and return an opaque
    context dict (DataFrames, counters); ``validate`` returns the number
    of mismatched chunks/rows (0 = clean)."""

    full_copy: Callable[[dict], dict]
    inc_copy: Callable[[dict], dict]
    validate: Callable[[dict], int]
    reconcile: Callable[[dict], dict]
    max_repairs: int = 2
    history: list[str] = field(default_factory=list)

    def _enter(self, s: State) -> None:
        self.history.append(s.value)

    def run(self, ctx: dict | None = None) -> dict:
        ctx = dict(ctx or {})
        self._enter(State.FULL_COPY)
        ctx = self.full_copy(ctx)
        self._enter(State.INC_COPY)
        ctx = self.inc_copy(ctx)
        repairs = 0
        while True:
            self._enter(State.CATCH_UP_VALIDATION)
            n_bad = self.validate(ctx)
            ctx["last_validation_mismatches"] = n_bad
            if n_bad == 0:
                self._enter(State.FINISHED)
                ctx["state"] = State.FINISHED
                return ctx
            if repairs >= self.max_repairs:
                self._enter(State.FAILED)
                ctx["state"] = State.FAILED
                raise RuntimeError(
                    f"import diverged: {n_bad} mismatches persist after "
                    f"{repairs} reconciliation passes (history={self.history})"
                )
            self._enter(State.RECONCILIATION)
            ctx = self.reconcile(ctx)
            repairs += 1
