#!/usr/bin/env python
"""Cross-round bench diff: compare BENCH_full.json (or any two bench
payload files / driver BENCH_r{N}.json with a "parsed" body) and print
per-query deltas, worst regressions, and coverage changes.

    python tools/bench_compare.py BENCH_r05.json BENCH_full.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    # driver artifacts wrap the payload under "parsed"
    if isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    qa, qb = a.get("queries") or {}, b.get("queries") or {}
    common = sorted(set(qa) & set(qb))
    print(f"A={sys.argv[1]}: {len(qa)} timed, total {a.get('value')}s")
    print(f"B={sys.argv[2]}: {len(qb)} timed, total {b.get('value')}s")
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    if only_a:
        print(f"dropped in B ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"new in B ({len(only_b)}): {', '.join(only_b)}")
    if not common:
        return
    deltas = sorted(
        ((qb[n] - qa[n], qb[n] / qa[n] if qa[n] else float("inf"), n) for n in common),
        reverse=True,
    )
    tot_a = sum(qa[n] for n in common)
    tot_b = sum(qb[n] for n in common)
    print(f"\ncommon {len(common)} queries: {tot_a:.2f}s -> {tot_b:.2f}s "
          f"({tot_b / tot_a:.2f}x)")
    print("worst 8 regressions (delta s, ratio):")
    for d, r, n in deltas[:8]:
        print(f"  {n:40s} {qa[n]:7.3f} -> {qb[n]:7.3f}  ({d:+.3f}s, {r:.2f}x)")
    print("best 5 improvements:")
    for d, r, n in deltas[-5:][::-1]:
        print(f"  {n:40s} {qa[n]:7.3f} -> {qb[n]:7.3f}  ({d:+.3f}s, {r:.2f}x)")
    for sec in ("stress",):
        sa, sb = (a.get(sec) or {}).get("ratio_vs_base"), (b.get(sec) or {}).get("ratio_vs_base")
        if sa and sb:
            ks = sorted(set(sa) & set(sb), key=lambda k: sb[k] - sa[k], reverse=True)
            print(f"\n{sec} ratio-vs-base drift (top 5, SHARED-JVM — noisy):")
            for k in ks[:5]:
                print(f"  {k:40s} {sa[k]:.1f}x -> {sb[k]:.1f}x")
        # clean-JVM re-measures (round 7+): the trustworthy cross-round axis
        ca, cb = (a.get(sec) or {}).get("clean"), (b.get(sec) or {}).get("clean")
        if cb:
            print(f"\n{sec} clean-JVM timings (fresh subprocess, best-of-2):")
            for k in sorted(cb, key=lambda k: -cb[k]):
                prev = f"{ca[k]:7.3f}s ->" if ca and k in ca else "   (new)   "
                print(f"  {k:40s} {prev} {cb[k]:7.3f}s")


if __name__ == "__main__":
    main()
