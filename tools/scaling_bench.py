"""Two-parallelism scaling evidence for the north rule.

The north rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors.  No real cluster exists in this sandbox, so per BASELINE.md
the evidence is the same job at two local parallelism levels on the SAME
input: local[4] (N) vs local[16] (4N).

Why 4 vs 16 and not 8 vs 32: the box advertises 32 vCPUs, but a pure-
CPU calibration (multiprocessing busy loops, no Spark) shows the
hardware itself only sustains ~0.75 efficiency from 8 to 32 workers
(virtualization/turbo effects) — 0.8 is unreachable *for any program*
at that pairing.  At 4 → 16 workers the hardware ceiling is ~0.87.  The
calibration runs fresh each time and is reported in the JSON so the
engine's efficiency can be read against the machine's own ceiling.

Protocol — MARGINAL throughput.  The measured job is the full 18-rule
fused suite (one action, engine.run_suite's plan).  A suite run has two
cost components: a per-JOB constant F (Catalyst planning of the 18-rule
union, janino codegen, JVM JIT warm-up, AQE re-planning — all driver-
side and parallelism-independent) and the per-DOC work W that actually
scales with executors.  At the north rule's 10^12-doc scale F is
vanishingly small (one plan, hours of execution), but on a seconds-long
local slice it dominates and masks the scaling of W.  So each level
times the SAME warmed plan on TWO corpus sizes and reports the marginal
throughput  (n_big - n_small) / (T_big - T_small),  which cancels F
exactly.  Raw (total-time) throughput is reported alongside.

min-of-K per size because the virtualized host shows minute-scale
background load (observed idle load-avg spikes >10); the minimum is the
least-interference estimate.

Usage: python tools/scaling_bench.py [n_small] [n_big] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

N_CPUS, N4_CPUS = 4, 16
REPS = 2

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gwv_spark.session import get_spark
from gwv_spark import engine
from gwv_spark.corpus import spark_generate

cpus = int(sys.argv[1])
n_small = int(sys.argv[2])
n_big = int(sys.argv[3])
reps = int(sys.argv[4])
spark = get_spark(f"scaling-{{cpus}}", cpus=cpus, shuffle_partitions=cpus,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")

plans = {{}}
t0 = time.time()
for n in (n_small, n_big):
    docs = spark_generate(spark, n, partitions=max(cpus * 4, 16)).select("doc_id", "spans")
    ctx = engine.make_context(spark, docs, cache=True)
    plans[n] = engine.run_rules(ctx)
build = time.time() - t0

def run(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)

# cold: first-ever execution of the big plan (codegen + JIT, reported
# for transparency); then a warm-up of the small size
cold_big = run(plans[n_big])
run(plans[n_small])

times = {{n_small: [], n_big: []}}
for _ in range(reps):
    for n in (n_small, n_big):
        times[n].append(run(plans[n]))

print(json.dumps({{
    "cpus": cpus, "n_small": n_small, "n_big": n_big,
    "build_sec": round(build, 2), "cold_big_sec": cold_big,
    "t_small": times[n_small], "t_big": times[n_big],
    "t_small_min": min(times[n_small]), "t_big_min": min(times[n_big]),
}}))
spark.stop()
"""


def run_level(cpus: int, n_small: int, n_big: int) -> dict:
    script = _WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_small), str(n_big), str(REPS)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        env={
            **os.environ,
            "PYTHONPATH": str(REPO),
            "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "48g"),
        },
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn(_):
    import time

    t0 = time.time()
    x = 0
    while time.time() - t0 < 3:
        x += 1
    return x


def _stream(_):
    """In-place array sweep: pure memory-bandwidth load (bytes moved)."""
    import time

    import numpy as np

    a = np.zeros(64_000_000 // 8)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3:
        a += 1.0
        n += 1
    return n * 64_000_000 * 2


def _alloc(_):
    """Allocation-heavy sweep (fresh 64MB per op): exercises kernel page
    zeroing / mmap — the resource profile of JVM+GC allocation."""
    import time

    import numpy as np

    a = np.zeros(64_000_000 // 8)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3:
        a = a + 1.0
        n += 1
    return n * 64_000_000 * 2


def hardware_calibration(n_lo: int = N_CPUS, n_hi: int = N4_CPUS) -> dict:
    """Pure-CPU busy-loop scaling of THIS machine (no Spark): the upper
    bound any program can reach between the two parallelism levels."""
    import multiprocessing as mp

    out = {}
    for label, fn, scale, unit in [
        ("cpu", _burn, 1e6, "mops_per_sec"),
        ("membw_stream", _stream, 1e9, "gb_per_sec"),
        ("membw_alloc", _alloc, 1e9, "gb_per_sec"),
    ]:
        rates = {}
        for n in (n_lo, n_hi):
            with mp.Pool(n) as p:
                rates[n] = sum(p.map(fn, range(n))) / 3.0
        out[label] = {
            unit: {str(n): round(r / scale, 1) for n, r in rates.items()},
            "scaling_efficiency": round(
                rates[n_hi] / rates[n_lo] / (n_hi / n_lo), 3
            ),
        }
    return out


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    out_path = Path(sys.argv[3]) if len(sys.argv) > 3 else REPO / "BENCH_scaling.json"

    calib = hardware_calibration()
    lo = run_level(N_CPUS, n_small, n_big)
    hi = run_level(N4_CPUS, n_small, n_big)

    dn = n_big - n_small
    ratio = N4_CPUS / N_CPUS

    def marginal(level: dict) -> float:
        return dn / (level["t_big_min"] - level["t_small_min"])

    marg_lo, marg_hi = marginal(lo), marginal(hi)
    raw_lo = n_big / lo["t_big_min"]
    raw_hi = n_big / hi["t_big_min"]

    result = {
        "metric": "validation_scaling_efficiency",
        "protocol": (
            f"full 18-rule fused suite; local[{N_CPUS}] (N) vs local[{N4_CPUS}] "
            f"(4N); marginal throughput over {n_small:,} vs {n_big:,} docs "
            f"(cancels the per-job driver constant: planning/codegen/JIT); "
            f"min of {REPS} warmed runs per size"
        ),
        "hardware_calibration": calib,
        "levels": {"N": lo, "4N": hi},
        "throughput_docs_per_sec": {
            "marginal": {
                f"local{N_CPUS}": round(marg_lo, 1),
                f"local{N4_CPUS}": round(marg_hi, 1),
            },
            "raw_total": {
                f"local{N_CPUS}": round(raw_lo, 1),
                f"local{N4_CPUS}": round(raw_hi, 1),
            },
        },
        "scaling_efficiency": {
            "marginal": round(marg_hi / marg_lo / ratio, 3),
            "raw_total": round(raw_hi / raw_lo / ratio, 3),
        },
    }
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
