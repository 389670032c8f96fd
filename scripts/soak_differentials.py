"""Differential soak: run the seeded compiler-vs-interpreter and
raw-JSON differentials (tests/test_differential_*.py) over many more
seeds than the CI parametrization uses.

Usage: python scripts/soak_differentials.py [N]   # default 100

Runs N compiler seeds + N/2 raw-JSON seeds + N/2 union-encoding seeds;
any divergence raises with the failing seed, value, and schema in the
assertion payload (re-run that seed via the pytest parametrize to
debug). Round-5 evidence: 150+75+75 fresh seeds passed in ~380 s on
local[8]."""
import sys, time
import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import test_differential_property as dp
import test_differential_raw_json as dj

t0 = time.time()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
for seed in range(1000, 1000 + N):
    dp.test_compiler_matches_interpreter(spark, seed)
    if seed % 10 == 0:
        print(f"compiler-vs-interpreter seed {seed} ok "
              f"({time.time()-t0:.0f}s)", flush=True)
for seed in range(2000, 2000 + N // 2):
    dj.test_raw_json_matches_interpreter(spark, seed)
    if seed % 10 == 0:
        print(f"raw-json seed {seed} ok ({time.time()-t0:.0f}s)", flush=True)
for seed in range(3000, 3000 + N // 2):
    dj.test_raw_json_union_encodings_match_interpreter(spark, seed)
    if seed % 10 == 0:
        print(f"raw-json-union seed {seed} ok ({time.time()-t0:.0f}s)",
              flush=True)
print(f"SOAK PASS: {N} + {N//2} + {N//2} seeds in {time.time()-t0:.0f}s")
