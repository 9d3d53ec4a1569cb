"""Per-query perf regression gate (VERDICT r3 next-round #9 stretch).

Compares a fresh bench detail file against the previous round's
BENCH_DETAIL.json and prints ok/regressed per query. Raw seconds move
±25% with VM weather (the r2→r3 post-mortem), so seconds are first
normalized by a box-speed canary — the crawl query, present in every
detail file — and only >RATIO_LIMIT normalized drift counts as a
regression. New queries (no baseline) and sub-floor queries (too fast
for a stable ratio) report as 'new'/'fast'.

Usage:
    python tools/bench_compare.py NEW.json [BASE.json]
        (BASE defaults to BENCH_DETAIL.json in the repo root)
Exit 1 iff any query regresses.
"""

from __future__ import annotations

import json
import os
import sys

RATIO_LIMIT = 2.5   # normalized drift beyond this = regression
FLOOR_SEC = 0.5     # below this on BOTH sides, timing noise dominates

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def canary(detail: dict) -> float:
    """Box-speed canary: crawl wall seconds (every detail file has it)."""
    q = detail.get("queries", {})
    c = q.get("crawl")
    if c is None and isinstance(detail.get("crawl"), dict):
        c = detail["crawl"].get("sec")
    if not c:
        raise SystemExit("no crawl canary in detail file")
    return float(c)


def compare(new: dict, base: dict) -> list[tuple[str, str, float, float, float]]:
    """[(query, verdict, base_sec, new_sec, normalized_ratio)] where
    verdict in {ok, regressed, improved, new, fast}."""
    speed = canary(new) / canary(base)  # >1 = this box is slower
    out = []
    nq, bq = new.get("queries", {}), base.get("queries", {})
    for name, new_sec in sorted(nq.items()):
        if name == "crawl":
            continue  # the canary itself can't be judged by itself
        base_sec = bq.get(name)
        if base_sec is None:
            out.append((name, "new", 0.0, new_sec, 0.0))
            continue
        if new_sec < FLOOR_SEC and base_sec < FLOOR_SEC:
            out.append((name, "fast", base_sec, new_sec, 0.0))
            continue
        ratio = (new_sec / speed) / base_sec
        if ratio > RATIO_LIMIT:
            verdict = "regressed"
        elif ratio < 1.0 / RATIO_LIMIT:
            verdict = "improved"
        else:
            verdict = "ok"
        out.append((name, verdict, base_sec, new_sec, round(ratio, 2)))
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    new = json.load(open(sys.argv[1]))
    base_path = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(_REPO, "BENCH_DETAIL.json")
    )
    base = json.load(open(base_path))
    rows = compare(new, base)
    speed = canary(new) / canary(base)
    print(
        f"canary crawl: base {canary(base):.1f}s new {canary(new):.1f}s "
        f"(box speed x{speed:.2f}); limit x{RATIO_LIMIT} normalized"
    )
    regressed = 0
    for name, verdict, b, n, r in rows:
        mark = {"regressed": "REGRESSED", "improved": "improved ",
                "ok": "ok       ", "new": "new      ",
                "fast": "fast     "}[verdict]
        extra = f" base={b:.2f}s new={n:.2f}s norm x{r}" if r else \
            f" new={n:.2f}s"
        print(f"{mark} {name}{extra}")
        regressed += verdict == "regressed"
    print(f"\n{regressed} regressed / {len(rows)} compared")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
