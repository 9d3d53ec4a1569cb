"""Driver-window rotation discipline (VERDICT r3 next-round #3).

The round driver records a correctness row for only the FIRST
``WINDOW`` entries of ``__spark_entry__.queries()``; the rest of the
contract is re-verified only by the builder's local gate that round.
This tool fails if the current dict order would let any query go more
than ``MAX_STALE`` consecutive rounds without an official driver row —
run it after reordering each round, and in pytest (test_bench_contract
imports check()).

Rules checked against the last ``MAX_STALE`` CORRECTNESS_r*.json files:
 1. every query name in queries() must either sit inside the first
    WINDOW slots now, or have a green row in one of those files;
 2. any query that was RED in the most recent round must sit inside the
    window (a fix is unverified until the driver re-records it);
 3. names present in queries() but absent from every recent round and
    outside the window are flagged as never-recorded (new queries must
    enter through the window).

Usage: python tools/window_rotation.py [--window 50] [--stale 2]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

WINDOW = 50
MAX_STALE = 2

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_order(repo: str = _REPO) -> list[str]:
    """Parse queries() dict order WITHOUT importing pyspark (the tool
    must stay runnable as a fast pre-commit check)."""
    src = open(os.path.join(repo, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        raise RuntimeError("queries() dict not found")
    return [
        n for n, _ in re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+),', m.group(1))
    ]


def recent_rounds(repo: str = _REPO, n: int = MAX_STALE) -> list[tuple[str, dict]]:
    """Last n CORRECTNESS_r*.json files, newest first."""
    files = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    )
    return [(os.path.basename(p), json.load(open(p))) for p in files[:n]]


def _green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match", True)
        and not rec.get("err")
    )


def check(
    repo: str = _REPO, window: int = WINDOW, stale: int = MAX_STALE
) -> list[str]:
    """Return a list of violation strings (empty = ok)."""
    order = query_order(repo)
    rounds = recent_rounds(repo, stale)
    in_window = set(order[:window])
    problems = []
    green_recently = set()
    for _, recs in rounds:
        green_recently |= {q for q, r in recs.items() if _green(r)}
    latest = rounds[0][1] if rounds else {}
    for q in order:
        if q in in_window:
            continue
        if q not in green_recently:
            if any(q in recs for _, recs in rounds):
                problems.append(
                    f"{q}: red/errored in the last {stale} round(s) but "
                    f"outside the {window}-slot window"
                )
            else:
                problems.append(
                    f"{q}: no driver row in the last {stale} round(s) and "
                    f"outside the {window}-slot window"
                )
    for q, rec in latest.items():
        if q in order and not _green(rec) and q not in in_window:
            problems.append(
                f"{q}: RED last round but outside the window — the fix "
                f"cannot be driver-recorded"
            )
    return problems


def main() -> None:
    window, stale = WINDOW, MAX_STALE
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--window":
            window = int(args.pop(0))
        elif a == "--stale":
            stale = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")
    problems = check(window=window, stale=stale)
    order = query_order()
    rounds = [name for name, _ in recent_rounds(n=stale)]
    print(
        f"{len(order)} queries; window={window}; rounds checked: "
        f"{', '.join(rounds) or 'none'}"
    )
    for p in problems:
        print(f"VIOLATION  {p}")
    print(f"{len(problems)} violations")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
