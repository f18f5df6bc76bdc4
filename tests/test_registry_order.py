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


def test_rows_only_set_is_exactly_the_documented_perf_twins():
    """queries() \\ oracle_sql() must be empty or INTENTIONAL: every
    rows-only entry is a declared perf twin of an oracle-backed sibling
    (the registry-level marker documents why each twin cannot hash
    against DuckDB — r12 verdict residual #3)."""
    rows_only = set(Q.queries()) - set(Q.oracle_sql())
    assert rows_only == set(Q._ROWS_ONLY_PERF_TWINS), (
        f"undeclared rows-only entries: {rows_only - Q._ROWS_ONLY_PERF_TWINS}"
        f" / stale markers: {Q._ROWS_ONLY_PERF_TWINS - rows_only}"
    )
    # each twin's oracle-backed sibling must still be registered
    oracles = set(Q.oracle_sql())
    for twin, sibling in {
        "dedup_minhash_lsh_xxhash": "dedup_minhash_lsh",
        "embed_cosine_topk_arrow": "embed_cosine_topk",
        "embed_ivf_topk": "embed_ivf_topk_quantized",
    }.items():
        assert twin in Q._ROWS_ONLY_PERF_TWINS
        assert sibling in oracles, f"{twin}'s sibling {sibling} lost its oracle"


def _latest_grade_by_query() -> dict[str, int]:
    import json
    import os

    last: dict[str, int] = {}
    for r in ("01", "02", "03", "04", "05", "06", "07", "08", "09", "10",
              "11", "12"):
        path = f"/root/repo/CORRECTNESS_r{r}.json"
        if os.path.exists(path):
            with open(path) as fh:
                for name in json.load(fh):
                    last[name] = int(r)
    return last


def test_round13_rotation_window_holds_the_oldest_grades():
    """Round-13 rotation policy: every never-graded oracle-backed query
    sits INSIDE the 50-slot window (orders_wire_temporal_retype — the
    one query that stayed ungraded through r12, the r12 verdict's ask
    #1 — leads it, followed by this round's five newcomers); the 11
    r9-graded names queued at round 12's _GRADE_DEFER head are all
    promoted (retiring r9 entirely); the remaining slots hold r10-graded
    veterans (the oldest grades left) plus the cdc_full_pipeline
    flagship anchor. The r10-graded names that don't fit queue at
    _GRADE_DEFER's HEAD — positions right after the window — as round
    14's first promotions. After this round's grading no oracle-backed
    query is ever ungraded, none's latest official grade is older than
    r10, and only those queued names remain at r10."""
    names = list(Q.queries())
    window = names[:GRADE_WINDOW]
    wset = set(window)
    oracles = set(Q.oracle_sql())
    last = _latest_grade_by_query()
    # every never-graded oracle-backed query is in the window
    never = [n for n in names if n in oracles and n not in last]
    outside = [n for n in never if n not in wset]
    assert not outside, f"never-graded oracle queries outside window: {outside}"
    assert "orders_wire_temporal_retype" in wset
    # the promotion QUEUE (r10-graded remainder) sits as a contiguous
    # block RIGHT behind the window, ahead of every fresher-graded name
    queue = [n for n in names if n not in wset and last.get(n) == 10]
    first_fresh = min(
        (names.index(n) for n in names
         if n not in wset and last.get(n, 0) >= 11),
        default=len(names),
    )
    buried = [n for n in queue if names.index(n) > first_fresh]
    assert not buried, f"promotion-queue names buried behind fresher grades: {buried}"
    # 17 = the 14 r10 names the original window displaced + 3 more
    # bumped when the round's three late newcomers took their slots
    assert len(queue) <= 17, f"promotion queue too deep for one round: {queue}"
    # r9-or-older grades must not exist anywhere outside the window
    stale = {n for n in oracles if last.get(n, 99) <= 9 and n not in wset}
    assert not stale, f"r9-stale grades left outside the window: {stale}"
    assert "cdc_full_pipeline" in wset
    fresh = [
        n for n in window
        if n != "cdc_full_pipeline" and last.get(n, 0) > 10
    ]
    assert not fresh, f"window slots wasted on freshly-graded queries: {fresh}"
