"""Merge per-phase minima from the bench_scaling run and extra
interleaved bench.py runs into the round-2 scaling evidence block.

Usage: python scripts/merge_scaling.py base2.json base8.json \
           extra2.jsonl extra8.jsonl

base{2,8}.json: {"phase": sec, ...} minima from the bench_scaling run
(BENCH/scaling_local2_local8.md "phase minima" cells). extra jsonl: raw
bench.py lines. Prints the merged table + efficiency.
"""

from __future__ import annotations

import json
import sys

N_DOCS = 24_000_000


def load_phases(path: str) -> list[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line)["suite"])
    return out


def main() -> None:
    base2, base8, extra2, extra8 = sys.argv[1:5]
    with open(base2) as f:
        runs2 = [json.load(f)]
    with open(base8) as f:
        runs8 = [json.load(f)]
    runs2 += load_phases(extra2)
    runs8 += load_phases(extra8)
    keys = runs2[0].keys()
    min2 = {k: min(r[k] for r in runs2) for k in keys}
    min8 = {k: min(r[k] for r in runs8) for k in keys}
    t2, t8 = sum(min2.values()), sum(min8.values())
    th2, th8 = N_DOCS / t2, N_DOCS / t8
    eff = th8 / (4 * th2)
    print(json.dumps({
        "n_runs": [len(runs2), len(runs8)],
        "local2_phase_min": {k: round(v, 3) for k, v in min2.items()},
        "local8_phase_min": {k: round(v, 3) for k, v in min8.items()},
        "local2_total": round(t2, 3), "local8_total": round(t8, 3),
        "local2_docs_per_sec": round(th2, 1),
        "local8_docs_per_sec": round(th8, 1),
        "efficiency_2_to_8": round(eff, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
