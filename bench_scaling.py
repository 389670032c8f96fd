"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors; sandboxed as local[8] → local[32]
on the same input — see BASELINE.md).

Runs bench.py as subprocesses (fresh JVM each, no session reuse),
N_RUNS per level, takes the best run per level (min total — least
noise on a shared box), writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "1000000"))
N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
LEVELS = (8, 32)
DATA_DIR = os.environ.get(
    "BENCH_DATA_DIR", f"/tmp/schematic_scaling_{N_DOCS}"
)


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_N_DOCS=str(N_DOCS),
        BENCH_QUERIES="none",
        BENCH_DATA_DIR=DATA_DIR,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    # pre-generate the shared input once (both levels read these files)
    print(f"generating shared input ({N_DOCS:,} docs) → {DATA_DIR}")
    run_once(32)  # first run generates; its timing is discarded

    # interleave levels (A B A B …) so slow host-noise windows hit both
    # levels equally; best-of-N per level suppresses the noise floor
    runs: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for _ in range(N_RUNS):
        for cpus in LEVELS:
            runs[cpus].append(run_once(cpus))
    results: dict[int, dict] = {}
    for cpus in LEVELS:
        best = min(runs[cpus], key=lambda r: r["value"])
        best["all_runs_sec"] = [r["value"] for r in runs[cpus]]
        results[cpus] = best
        print(f"local[{cpus}]: best {best['value']}s "
              f"({best['docs_per_sec']} docs/s), runs {best['all_runs_sec']}")

    t8 = results[8]["docs_per_sec"]
    t32 = results[32]["docs_per_sec"]
    eff = t32 / (4 * t8)
    print(f"scaling efficiency (8→32 cores): {eff:.3f}")

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

Workload: full constraint suite (row-local validation + per-column
stats + salted uniqueness + referential anti-join + KS/chi-square drift
+ span-order check) over the deterministic synthetic interleaved-doc
table ({N_DOCS:,} docs, seed 42), read from parquet — `bench.py
full_suite`. The reference publishes no numbers (BASELINE.md), so these
are the engine's own baselines.

Two-cluster-size criterion (north rule: efficiency >= 0.8 from N to 4N
executors) evidenced per BASELINE.md sandbox note by running the same
job at two parallelism levels on the same input:

| parallelism | suite total (s) | docs/sec | phase breakdown (s) |
|---|---|---|---|
| local[8]  (N)  | {results[8]["value"]} | {results[8]["docs_per_sec"]:,} | {json.dumps(results[8]["suite"])} |
| local[32] (4N) | {results[32]["value"]} | {results[32]["docs_per_sec"]:,} | {json.dumps(results[32]["suite"])} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) =
{eff:.3f}** ({'meets' if eff >= 0.8 else 'below'} the >= 0.8 bar).

Caveats recorded for honesty:
- single-JVM local mode shares one driver; at 4N the fixed driver-side
  costs (plan compile, collect) do not shrink, so this understates true
  multi-executor scaling for the scan-heavy phases;
- best-of-{N_RUNS} per level to suppress shared-sandbox noise;
  all runs listed: local[8] {results[8]["all_runs_sec"]},
  local[32] {results[32]["all_runs_sec"]}.

Raw JSON:

```json
{json.dumps(results[8])}
{json.dumps(results[32])}
```
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
