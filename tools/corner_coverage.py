"""Line coverage of the reference corner validator's graph region
(corner.py:288-497 — connect/preemption + is_ZH_corner) under the fuzz
generators (VERDICT r3 next #7).

No coverage package in this sandbox, so a sys.settrace line collector
scoped to the reference corner.py does the job; "executable lines" are
taken from the compiled code objects' line tables, so comments/blanks
don't count against the ratio.

Usage: python tools/corner_coverage.py [n_geom_seeds] [n_fuzz_docs]
Prints a JSON summary + the unhit executable lines in the target range.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

LO, HI = 288, 497


def executable_lines(path: Path, lo: int, hi: int) -> set[int]:
    code = compile(path.read_text(), str(path), "exec")
    lines: set[int] = set()

    def walk(co):
        for _, _, ln in co.co_lines():
            if ln is not None and lo <= ln <= hi:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                walk(const)

    walk(code)
    return lines


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 131
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from gwv_spark.ref_expected import _import_reference

    gwv = _import_reference()
    corner_path = Path(gwv.__file__).parent / "validators" / "corner.py"
    target = str(corner_path)

    hit: set[int] = set()

    def tracer(frame, event, arg):
        if frame.f_code.co_filename == target:
            if event == "line":
                ln = frame.f_lineno
                if LO <= ln <= HI:
                    hit.add(ln)
            return tracer
        # don't trace into unrelated frames (keeps the sweep fast)
        return tracer if event == "call" else None

    from gwv_spark.corpus import CORPUS_TS, gen_record

    # load the fuzz generator under audit by path (its module imports
    # tests.parity, which only resolves under pytest's rootdir setup)
    import importlib.util

    src = (REPO / "tests" / "test_geom_fuzz.py").read_text()
    gen_src = src[: src.index("@pytest.mark.parametrize")]
    gen_src = "\n".join(
        l for l in gen_src.splitlines() if not l.startswith("from tests.parity")
    )
    ns: dict = {}
    exec(compile(gen_src, "test_geom_fuzz_gen", "exec"), ns)
    _geom_records = ns["_geom_records"]

    def run_ref(records):
        data = {name: (related, g) for name, related, g in records}
        dump = gwv.dump.Dump(data, CORPUS_TS)
        gwv.validator.validate(dump, ["corner"])

    sys.settrace(tracer)
    try:
        # the standard corpus (what the driver oracle sees at sf0.01)
        run_ref([gen_record(i, 5000) for i in range(5000)])
        std_hit = set(hit)
        # the geometry fuzz sweep's seed range (0-99 regular + 100-130
        # extended, tests/test_geom_fuzz.py + test_extended_fuzz.py)
        for seed in range(n_seeds):
            run_ref(_geom_records(seed, n_docs))
    finally:
        sys.settrace(None)

    exe = executable_lines(corner_path, LO, HI)
    unhit = sorted(exe - hit)
    out = {
        "target": f"reference corner.py:{LO}-{HI} (connect/preemption + is_ZH_corner)",
        "executable_lines": len(exe),
        "hit_std_corpus_only": len(std_hit & exe),
        "hit_total": len(hit & exe),
        "coverage_pct": round(100 * len(hit & exe) / len(exe), 1),
        "geom_seeds": n_seeds,
        "docs_per_seed": n_docs,
        "unhit_lines": unhit,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
