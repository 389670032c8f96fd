"""Build the per-query noise table (min/median/max) from bench logs.

Usage: python scripts/noise_table.py /tmp/bench_r5_run*.log

Each log's LAST ``BENCH_DETAIL:``-prefixed line is parsed (the bare
headline JSON is NOT a substitute — it carries only the top-8 query
timings, which would skew the table; logs without a detail line are
skipped with a notice); per-query timings aggregate across runs into
a markdown table sorted by min descending — the shape BENCH/noise_r*.md
records each round. Failed queries (-1.0) are excluded per-run."""

from __future__ import annotations

import json
import statistics
import sys


def detail_from_log(path: str) -> dict | None:
    detail = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("BENCH_DETAIL: "):
                detail = json.loads(line[len("BENCH_DETAIL: "):])
    return detail


def main(paths: list[str]) -> None:
    runs = []
    for p in paths:
        d = detail_from_log(p)
        if d is None:
            print(f"-- {p}: no BENCH_DETAIL line, skipped", file=sys.stderr)
            continue
        runs.append((p, d))
    if not runs:
        raise SystemExit("no parsable runs")
    per_q: dict[str, list[float]] = {}
    for _, d in runs:
        for q, t in d.get("queries", {}).items():
            if t >= 0:
                per_q.setdefault(q, []).append(t)
    print(f"Suite totals: "
          + " / ".join(f"{d['value']}" for _, d in runs)
          + f" s (mode {runs[0][1].get('suite_mode', 'classic')}, "
          + f"{runs[0][1].get('suite_n_docs')} docs)")
    print()
    print("| min | median | max | n | query |")
    print("|---|---|---|---|---|")
    rows = sorted(
        per_q.items(), key=lambda kv: -min(kv[1])
    )
    for q, ts in rows:
        print(f"| {min(ts):.2f} | {statistics.median(ts):.2f} "
              f"| {max(ts):.2f} | {len(ts)} | {q} |")


if __name__ == "__main__":
    main(sys.argv[1:])
