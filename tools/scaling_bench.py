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
calibration runs fresh each time (start AND end of the experiment) and
is reported in the JSON so the engine's efficiency can be read against
the machine's own ceiling.

Protocol (round 2 — redesigned per the round-1 review):

- MEASURED CONFIGURATION: engine.run_rules_concurrent — every rule's
  plan submitted as its own Spark job, several in flight (the deployed
  configuration; measured ~4× faster than the single 18-branch union at
  local[32] because the union serializes all driver-side branch work
  behind one job while concurrent jobs overlap driver and executor
  work).
- MARGINAL throughput: each level times the SAME warmed plans on TWO
  corpus sizes and reports (n_big - n_small) / (T_big - T_small), which
  cancels the per-job parallelism-independent constant (Catalyst
  analysis, codegen, JIT warm-up) exactly.  Raw totals are reported
  alongside.
- INTERLEAVED A/B/A/B: both levels run as PERSISTENT worker processes
  (corpus built and cached once per level); measurement turns alternate
  N, 4N, N, 4N ... coordinated by token files, so minute-scale host
  drift (observed idle load-avg spikes >10 on this box) hits both
  levels symmetrically instead of whichever ran second.
- min-of-K turns per level (K = ROUNDS) as the least-interference
  estimate; all per-turn samples are reported for dispersion.

Round-3 upgrade — REAL executors: with SCALING_MODE=executors (the
default) each level is a `local-cluster[E,C,M]` master, i.e. E separate
executor JVMs with their own heaps, block managers, and netty shuffle —
the literal "N executors vs 4N executors" of the north rule (1×C cores
vs 4×C cores), not just more threads in one JVM.  SCALING_MODE=threads
keeps the old local[4]/local[16] shape.  A calibration GATE delays the
start until the host itself can scale (membw_stream ceiling ≥
SCALING_GATE): this box is a shared VM whose observed idle memory
bandwidth varies 2× minute-to-minute, and measuring a distributed
engine's scaling in a window where a pure STREAM loop scales at 0.33 is
measuring the neighbor's workload, not the engine.

Usage: python tools/scaling_bench.py [n_small] [n_big] [out_json] [rounds]
Env:   SCALING_MODE=executors|threads  SCALING_CORES=4  SCALING_EXEC_MB=10240
       SCALING_GATE=0.5  SCALING_GATE_WAIT_S=1800
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

MODE = os.environ.get("SCALING_MODE", "executors")
CORES = int(os.environ.get("SCALING_CORES", "4"))
EXEC_MB = int(os.environ.get("SCALING_EXEC_MB", "10240"))
GATE = float(os.environ.get("SCALING_GATE", "0.5"))
GATE_WAIT_S = float(os.environ.get("SCALING_GATE_WAIT_S", "1800"))

if MODE == "executors":
    # 1 executor vs 4 executors, C cores each
    N_CPUS, N4_CPUS = CORES, 4 * CORES
    MASTERS = {
        N_CPUS: f"local-cluster[1,{CORES},{EXEC_MB}]",
        N4_CPUS: f"local-cluster[4,{CORES},{EXEC_MB}]",
    }
else:
    N_CPUS, N4_CPUS = 4, 16
    MASTERS = {N_CPUS: f"local[{N_CPUS}]", N4_CPUS: f"local[{N4_CPUS}]"}
ROUNDS = 5

_WORKER = r"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, {repo!r})
from gwv_spark.session import get_spark
from gwv_spark import engine
from gwv_spark.corpus import spark_generate

cpus = int(sys.argv[1])
n_small = int(sys.argv[2])
n_big = int(sys.argv[3])
rounds = int(sys.argv[4])
sync = Path(sys.argv[5])
master = sys.argv[6]
exec_mb = sys.argv[7]

# local-cluster's [E,C,M] M is the WORKER's capacity, not the executor
# request: without spark.executor.memory the executors launch at the
# 1g default and OOM (exit 52) once the cached corpus exceeds it
spark = get_spark(f"scaling-{{cpus}}", cpus=cpus, shuffle_partitions=cpus,
                  master=master,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.executor.memory": exec_mb + "m",
                               "spark.executorEnv.PYTHONPATH": {repo!r}}})
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
ctxs = {{}}
for n in (n_small, n_big):
    docs = spark_generate(spark, n, partitions=max(cpus * 4, 16)).select("doc_id", "spans")
    ctxs[n] = engine.make_context(spark, docs, cache=True)
build = time.time() - t0

def run(n):
    t0 = time.time()
    engine.run_rules_concurrent(ctxs[n])
    return round(time.time() - t0, 2)

# warm both sizes once (codegen + JIT; python workers spin up)
cold = {{n: run(n) for n in (n_small, n_big)}}

(sync / f"ready_{{cpus}}").write_text("1")

for k in range(rounds):
    token = sync / f"turn_{{cpus}}_{{k}}"
    while not token.exists():
        time.sleep(0.2)
    # untimed primer: the first run after minutes of idle-polling is
    # penalized several-fold on this host (parked JIT/GC/page state) —
    # measure the woken steady state, twice per size per turn
    run(n_small)
    res = {{"t_small": [], "t_big": []}}
    for _ in range(2):
        res["t_small"].append(run(n_small))
        res["t_big"].append(run(n_big))
    (sync / f"done_{{cpus}}_{{k}}").write_text(json.dumps(res))

(sync / f"result_{{cpus}}").write_text(json.dumps({{
    "cpus": cpus, "build_sec": round(build, 2),
    "cold_small_sec": cold[n_small], "cold_big_sec": cold[n_big],
}}))
spark.stop()
"""


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
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    out_path = Path(sys.argv[3]) if len(sys.argv) > 3 else REPO / "BENCH_scaling.json"
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else ROUNDS

    # gate: wait for a window where the HOST can scale before measuring
    # whether the ENGINE does
    gate_samples = []
    t_gate = time.time()
    while True:
        c = hardware_calibration()
        gate_samples.append(c["membw_stream"]["scaling_efficiency"])
        if not GATE or gate_samples[-1] >= GATE:
            calib_before = c
            break
        if time.time() - t_gate > GATE_WAIT_S:
            calib_before = c  # proceed anyway; ceiling is reported
            break
        time.sleep(60)

    sync = Path(tempfile.mkdtemp(prefix="scaling_sync_"))
    procs = {}
    for cpus in (N_CPUS, N4_CPUS):
        script = _WORKER.format(repo=str(REPO))
        procs[cpus] = subprocess.Popen(
            [sys.executable, "-c", script, str(cpus), str(n_small), str(n_big),
             str(rounds), str(sync), MASTERS[cpus], str(EXEC_MB)],
            cwd=REPO,
            env={
                **os.environ,
                "PYTHONPATH": str(REPO),
                "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "40g"),
                # both levels' standalone masters mint timestamp app-ids;
                # started in the same second they share an executor dir
                # under $SPARK_HOME/work (interleaved stderr only — each
                # worker tracks its executors by process handle, so no
                # functional clash).  Best-effort separation; the
                # embedded local-cluster Worker ignores this env var in
                # current Spark, so don't rely on it.
                "SPARK_WORKER_DIR": f"/tmp/spark_work_{cpus}",
            },
        )

    def wait_for(path: Path, timeout=3600):
        t0 = time.time()
        while not path.exists():
            for p in procs.values():
                if p.poll() not in (None, 0):
                    raise RuntimeError(f"worker died rc={p.returncode}")
            if time.time() - t0 > timeout:
                raise TimeoutError(str(path))
            time.sleep(0.5)

    # both corpora cached before any measurement turn
    for cpus in (N_CPUS, N4_CPUS):
        wait_for(sync / f"ready_{cpus}")

    turns: dict[int, list[dict]] = {N_CPUS: [], N4_CPUS: []}
    for k in range(rounds):
        for cpus in (N_CPUS, N4_CPUS):  # strict A/B alternation
            (sync / f"turn_{cpus}_{k}").write_text("1")
            done = sync / f"done_{cpus}_{k}"
            wait_for(done)
            turns[cpus].append(json.loads(done.read_text()))

    meta = {}
    for cpus, p in procs.items():
        wait_for(sync / f"result_{cpus}")
        meta[cpus] = json.loads((sync / f"result_{cpus}").read_text())
        p.wait(timeout=300)

    calib_after = hardware_calibration()

    dn = n_big - n_small
    ratio = N4_CPUS / N_CPUS

    def level_stats(cpus: int) -> dict:
        ts = [x for t in turns[cpus] for x in t["t_small"]]
        tb = [x for t in turns[cpus] for x in t["t_big"]]
        return {
            **meta[cpus],
            "t_small": ts,
            "t_big": tb,
            "t_small_min": min(ts),
            "t_big_min": min(tb),
        }

    lo, hi = level_stats(N_CPUS), level_stats(N4_CPUS)
    marg_lo = dn / (lo["t_big_min"] - lo["t_small_min"])
    marg_hi = dn / (hi["t_big_min"] - hi["t_small_min"])
    raw_lo, raw_hi = n_big / lo["t_big_min"], n_big / hi["t_big_min"]
    eff_marginal = marg_hi / marg_lo / ratio
    eff_raw = raw_hi / raw_lo / ratio
    # per-round efficiency (paired turns, min within turn) for dispersion
    def _m(t):
        return min(t["t_big"]) - min(t["t_small"])

    per_round = [
        round((dn / _m(b)) / (dn / _m(a)) / ratio, 3)
        for a, b in zip(turns[N_CPUS], turns[N4_CPUS])
    ]
    membw_ceiling = min(
        calib_before["membw_stream"]["scaling_efficiency"],
        calib_after["membw_stream"]["scaling_efficiency"],
    )

    result = {
        "metric": "validation_scaling_efficiency",
        "mode": "executors" if MODE == "executors" else "threads",
        "protocol": (
            f"full 18-rule suite via run_rules_concurrent (per-rule jobs, "
            f"deployed configuration); {MASTERS[N_CPUS]} (N) vs "
            f"{MASTERS[N4_CPUS]} (4N)"
            + (" — separate executor JVMs, real netty shuffle"
               if MODE == "executors" else "")
            + f"; persistent workers, measurement turns interleaved N,4N x{rounds}; "
            f"marginal throughput over {n_small:,} vs {n_big:,} docs "
            f"(cancels the per-job driver constant); min over turns; "
            f"start gated on host membw_stream ceiling >= {GATE}"
        ),
        "gate_membw_samples": gate_samples,
        "hardware_calibration": {"before": calib_before, "after": calib_after},
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
            "marginal": round(eff_marginal, 3),
            "raw_total": round(eff_raw, 3),
            "per_round_marginal": per_round,
            "hardware_membw_ceiling": membw_ceiling,
            "marginal_vs_membw_ceiling": round(eff_marginal / membw_ceiling, 3)
            if membw_ceiling
            else None,
        },
    }
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
