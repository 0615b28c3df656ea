"""Emit the next round's ``_DRIVER_PRIORITY`` from the CORRECTNESS records.

The driver's correctness gate evaluates exactly the first
``GATE_SLOTS`` entries of ``capital.queries._DRIVER_PRIORITY`` each
round, and ``tests/test_driver_shape.py::test_rotation_freshness``
fails the suite whenever any oracle-paired query's latest hash-green
evidence would age past ``MAX_EVIDENCE_AGE`` rounds outside the next
window.  Rewriting the rotation by hand each round is error-prone (the
round-8 stall); this tool makes it mechanical:

    python tools/rotate_gate.py [--front name ...]

``--front`` names (new or code-touched queries that should re-evidence
first) are pinned to the head of the window.  After them come, oldest
evidence first:

1. never-checked oracle queries (no green record at all),
2. queries that are already stale at the upcoming gate (MUST be
   included or the freshness test fails),
3. the oldest remaining cohort, filling the window to ``GATE_SLOTS``
   so upcoming-round staleness is amortized instead of cliffing.

Ties inside a cohort keep registration order (stable, deterministic).
The emitted block is pasted verbatim into
``capital/queries/__init__.py``; the freshness test then verifies it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_SLOTS = 50
#: Round-14 capacity policy (round-13 verdict ask #2): the paired-query
#: count hit 197 vs the 50x4=200 ceiling (199 after the two round-14
#: rows landed; slack 51 vs the new ceiling 250), so the cap is raised
#: 4 -> 5 rather than adopting evidence-slot sharing —
#: a full rotation of ~200 queries takes exactly 4 gates, so age-5
#: keeps one round of scheduling slack while every query is still
#: driver-verified at least once per 5 rounds AND locally verified
#: against DuckDB at sf0.001 EVERY round (tests/test_oracle_parity.py
#: checks all queries regardless of the window). Must match
#: tests/test_driver_shape.py::_MAX_EVIDENCE_AGE.
MAX_EVIDENCE_AGE = 5


def latest_green_rounds() -> tuple[int, dict[str, int]]:
    """Latest hash-green driver round per query (same scan as the test)."""
    latest: dict[str, int] = {}
    top = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        top = max(top, rnd)
        with open(path) as fh:
            try:
                records = json.load(fh)
            except ValueError:
                continue
        for name, rec in records.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return top, latest


def plan_rotation(front: list[str] | None = None) -> list[str]:
    from capital.queries import all_oracles

    front = list(front or [])
    top, latest = latest_green_rounds()
    oracles = list(all_oracles())  # registration order
    unknown = [n for n in front if n not in oracles]
    if unknown:
        raise SystemExit(f"--front names not oracle-paired/registered: {unknown}")

    window: list[str] = list(dict.fromkeys(front))
    # Cohorts by evidence age, oldest first; never-checked sorts oldest.
    remaining = [n for n in oracles if n not in window]
    remaining.sort(key=lambda n: latest.get(n, 0))
    must = {n for n in oracles if latest.get(n, 0) <= top - MAX_EVIDENCE_AGE}
    missed = sorted(must - set(window) - set(remaining[: GATE_SLOTS - len(window)]))
    if missed:
        raise SystemExit(
            f"window cannot fit all stale queries (front list too long?): {missed}"
        )
    window.extend(remaining[: GATE_SLOTS - len(window)])
    return window


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--front", nargs="*", default=[], help="names pinned to the window head")
    ap.add_argument(
        "--forecast",
        action="store_true",
        help="also print which queries become stale at the FOLLOWING "
        "gate if this window runs green (round-planning aid)",
    )
    args = ap.parse_args()
    top, latest = latest_green_rounds()
    window = plan_rotation(args.front)
    print(f"# rotation for round {top + 1} gate ({len(window)} slots)")
    print("_DRIVER_PRIORITY = [")
    for name in window:
        ev = latest.get(name, 0)
        tag = f"r{ev}" if ev else "never"
        print(f'    "{name}",  # evidence: {tag}')
    print("]")
    if args.forecast:
        from capital.queries import all_oracles

        nxt = dict(latest)
        for name in window:
            nxt[name] = top + 1  # assume this gate lands green
        stale_next = sorted(
            n for n in all_oracles()
            if nxt.get(n, 0) <= (top + 1) - MAX_EVIDENCE_AGE
        )
        print(
            f"# forecast: {len(stale_next)} queries MUST enter the "
            f"round-{top + 2} window:"
        )
        for n in stale_next:
            print(f"#   {n} (r{nxt.get(n, 0)})")
        # Gate-capacity account (round-10 verdict ask #6): the window
        # sustains at most GATE_SLOTS x MAX_EVIDENCE_AGE oracle-paired
        # queries before some query MUST age past the freshness cap
        # no matter how the rotation is scheduled.
        n_oracles = len(all_oracles())
        ceiling = GATE_SLOTS * MAX_EVIDENCE_AGE
        print(
            f"# capacity: {n_oracles} oracle-paired queries vs the "
            f"{GATE_SLOTS}x{MAX_EVIDENCE_AGE}-round ceiling of "
            f"{ceiling} (slack {ceiling - n_oracles})"
        )
        if n_oracles > ceiling - 5:
            print(
                "# capacity POLICY NEEDED: within 5 of the ceiling — "
                "adopt evidence-slot sharing (a hash-oracled query "
                "carries its declared twins, the rows-only-ANN "
                "precedent) or raise MAX_EVIDENCE_AGE in both this "
                "tool and test_rotation_freshness."
            )


if __name__ == "__main__":
    main()
