#!/usr/bin/env python
"""One-shot backfill: import every scaling sample recorded in
BENCH/BASELINE.md (the human-readable log, kept since round 1) into
BENCH/scaling_runs.jsonl (the structured log `bench.py --report`
tallies, which only exists since mid-round-4).

Rationale: the ≥0.8-bar tally must count the FULL recorded history —
misses and passes alike — not just the samples taken after the
structured log was introduced; a tally over a partial window reads as
cherry-picking in either direction. Every parsed sample is appended
verbatim with ``"source": "backfill-md"`` (membw ceilings were not
recorded per-sample before the jsonl existed, so those stay null);
samples already present in the jsonl (same pairing, timestamp within
120 s) are skipped, so the script is idempotent.

Run from the repo root: ``python BENCH/backfill_scaling_md.py``.
"""

from __future__ import annotations

import json
import os
import re
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD = os.path.join(REPO, "BENCH", "BASELINE.md")
JSONL = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")

ROW = re.compile(
    r"^\| (\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) \| (\d+) \| ([\d.]+) \| "
    r"([\d.]+) \| ([\d.]+) \|"
)
EQ_BULLET = re.compile(
    r"^  - equal-load arm .*?: ([\d.]+) docs/s → equal-load efficiency "
    r"\*\*([\d.]+)\*\*"
)
PL_BULLET = re.compile(
    r"^  - pipeline-load arm .*pipeline-load efficiency \*\*([\d.]+)\*\*"
)
PAIRING = re.compile(
    r"^\*\*(\d+)→(\d+)-cpu pairing\*\* \((\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}), "
    r"n_pages (\d+)\): ([\d.]+) docs/s @\d+cpu → ([\d.]+) docs/s @\d+cpu, "
    r"raw efficiency \*\*([\d.]+)\*\*"
    r"(?:; equal-load .*?efficiency \*\*([\d.]+)\*\*)?"
)


def parse_md(path: str) -> list[dict]:
    samples: list[dict] = []
    cur: dict | None = None  # last 8->32 table row, awaiting its bullets
    with open(path) as f:
        for line in f:
            m = ROW.match(line)
            if m:
                cur = {
                    "when": m.group(1),
                    "pairing": "8->32",
                    "raw": float(m.group(5)),
                    "equal_load": None,
                    "pipeline_load": None,
                    "docs_per_sec_small": float(m.group(3)),
                    "docs_per_sec_large": float(m.group(4)),
                    "membw_ceiling": None,
                    "n_pages": int(m.group(2)),
                    "source": "backfill-md",
                }
                samples.append(cur)
                continue
            if cur is not None:
                eq = EQ_BULLET.match(line)
                if eq:
                    cur["equal_load"] = float(eq.group(2))
                    continue
                pl = PL_BULLET.match(line)
                if pl and pl.group(1):
                    cur["pipeline_load"] = float(pl.group(1))
                    continue
            p = PAIRING.match(line)
            if p:
                samples.append(
                    {
                        "when": p.group(3),
                        "pairing": f"{p.group(1)}->{p.group(2)}",
                        "raw": float(p.group(7)),
                        "equal_load": float(p.group(8)) if p.group(8) else None,
                        "pipeline_load": None,
                        "docs_per_sec_small": float(p.group(5)),
                        "docs_per_sec_large": float(p.group(6)),
                        "membw_ceiling": None,
                        "n_pages": int(p.group(4)),
                        "source": "backfill-md",
                    }
                )
                cur = None
    return samples


def _ts(s: str) -> float:
    return time.mktime(time.strptime(s, "%Y-%m-%d %H:%M:%S"))


def main() -> None:
    existing: list[dict] = []
    if os.path.exists(JSONL):
        with open(JSONL) as f:
            existing = [json.loads(line) for line in f if line.strip()]
    have = [(r["pairing"], _ts(r["when"])) for r in existing]

    def already_recorded(s: dict) -> bool:
        t = _ts(s["when"])
        return any(p == s["pairing"] and abs(t - ts) <= 120 for p, ts in have)

    new = [s for s in parse_md(MD) if not already_recorded(s)]
    with open(JSONL, "a") as f:
        for s in new:
            f.write(json.dumps(s) + "\n")
    print(
        json.dumps(
            {
                "parsed": len(parse_md(MD)),
                "already_in_jsonl": len(existing),
                "backfilled": len(new),
            }
        )
    )


if __name__ == "__main__":
    main()
