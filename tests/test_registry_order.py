"""The driver grades only the first 50 registry entries — keep every
graded slot an oracle-backed (hash-checked) query."""

from __future__ import annotations

from polardbx_cdc_spark import queries as Q

GRADE_WINDOW = 50


def test_first_50_entries_are_all_oracle_backed():
    names = list(Q.queries())
    oracles = Q.oracle_sql()
    graded = names[:GRADE_WINDOW]
    weak = [n for n in graded if n not in oracles]
    assert not weak, f"rows-only queries inside the graded window: {weak}"


def test_deferred_queries_still_registered_and_oracle_backed():
    names = list(Q.queries())
    oracles = Q.oracle_sql()
    for n in Q._GRADE_DEFER:
        assert n in names
        assert n in oracles


def test_registry_has_no_dangling_oracle():
    names = set(Q.queries())
    assert set(Q.oracle_sql()) <= names


def _latest_grade_by_query() -> dict[str, int]:
    import json
    import os

    last: dict[str, int] = {}
    for r in ("01", "02", "03", "04", "05", "06", "07", "08", "09", "10",
              "11"):
        path = f"/root/repo/CORRECTNESS_r{r}.json"
        if os.path.exists(path):
            with open(path) as fh:
                for name in json.load(fh):
                    last[name] = int(r)
    return last


def test_round12_rotation_window_holds_the_oldest_grades():
    """Round-12 rotation policy: every never-graded oracle-backed query
    sits INSIDE the 50-slot window (the binlog_checksum=NONE capstone
    cdc_dump_none_checksum_decode leads it — the r11 verdict's ask #2);
    the 10 r8-graded names queued at round 11's _GRADE_DEFER head are
    all promoted (retiring r8 entirely); the remaining slots hold
    r9-graded veterans (the oldest grades left after round 11) plus the
    cdc_full_pipeline flagship anchor. The ≤12 r9-graded names that
    don't fit queue at _GRADE_DEFER's HEAD — positions right after the
    window — as round 13's first promotions. After this round's grading
    no oracle-backed query is ever ungraded, none's latest official
    grade is older than r9, and only those queued names remain at r9."""
    names = list(Q.queries())
    window = names[:GRADE_WINDOW]
    wset = set(window)
    oracles = set(Q.oracle_sql())
    last = _latest_grade_by_query()
    assert "cdc_dump_none_checksum_decode" in wset
    # the promotion QUEUE (everything outside the window that round 13
    # must grade first — never-graded late additions + the r9-graded
    # remainder) sits as a contiguous block RIGHT behind the window,
    # ahead of every fresher-graded name (structural check: positions
    # shift as late additions land, the ORDER is the contract)
    never = [n for n in names if n in oracles and n not in last]
    queue = [n for n in names if n not in wset
             and (n in never or last.get(n) == 9)]
    first_fresh = min(
        (names.index(n) for n in names
         if n not in wset and last.get(n, 0) >= 10),
        default=len(names),
    )
    buried = [n for n in queue if names.index(n) > first_fresh]
    assert not buried, f"promotion-queue names buried behind fresher grades: {buried}"
    assert len(queue) <= 12, f"promotion queue too deep for one round: {queue}"
    # r8-or-older grades must not exist anywhere (round 12 retired them:
    # the 10 r8-graded defer-head names are all inside the window)
    stale = {n for n in oracles if last.get(n, 99) <= 8 and n not in wset}
    assert not stale, f"r8-stale grades left outside the window: {stale}"
    assert "cdc_full_pipeline" in wset
    fresh = [
        n for n in window
        if n != "cdc_full_pipeline" and last.get(n, 0) > 9
    ]
    assert not fresh, f"window slots wasted on freshly-graded queries: {fresh}"
