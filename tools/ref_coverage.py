"""Line coverage of EVERY reference validator under the differential
inputs (standard corpus + grammar fuzz + geometry fuzz).

Generalizes tools/corner_coverage.py (which audits only corner.py's
graph region) to the whole `gwv/validators/` directory: for each
validator file, how many of its executable lines does the parity/fuzz
corpus actually execute?  Unhit lines are generator blind spots — the
differential can only vouch for branches it reaches.

No coverage package in this sandbox, so a sys.settrace line collector
scoped to the validators directory does the job; "executable lines"
come from the compiled code objects' line tables, so comments/blanks
don't count against the ratio.

Usage: python tools/ref_coverage.py [n_grammar_seeds] [n_geom_seeds]
Writes COVERAGE_validators.json and prints the per-file table.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

ALL_RULES = [
    "corner", "related", "illegal", "skew", "donotuse", "kosekitoki",
    "mj", "ucsalias", "dup", "naming", "ids", "order", "delquote",
    "delvar", "numexp", "mustrenew", "j", "width",
]
# rule subsets each generator is constrained to (its grammar avoids only
# the shapes that crash the validators in ITS list — see the generator
# module docstrings)
FUZZ_RULES = [
    "numexp", "delquote", "delvar", "order", "kosekitoki", "ucsalias",
    "donotuse", "mustrenew", "skew", "illegal", "related", "ids", "naming",
    "j", "mj", "width",
]
GEOM_RULES = ["corner", "dup", "skew"]


def executable_lines(path: Path) -> set[int]:
    code = compile(path.read_text(), str(path), "exec")
    lines: set[int] = set()

    def walk(co):
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                walk(const)

    walk(code)
    return lines


def load_generator(test_file: str, fn_name: str):
    """Load a fuzz generator from its test module by source prefix (the
    module imports tests.parity, which only resolves under pytest)."""
    src = (REPO / "tests" / test_file).read_text()
    gen_src = src[: src.index("@pytest.mark.parametrize")]
    gen_src = "\n".join(
        l for l in gen_src.splitlines() if not l.startswith("from tests.parity")
    )
    ns: dict = {}
    exec(compile(gen_src, f"{test_file}:gen", "exec"), ns)
    return ns[fn_name]


def main() -> None:
    n_grammar = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    n_geom = int(sys.argv[2]) if len(sys.argv) > 2 else 161

    from gwv_spark.ref_expected import _import_reference

    gwv = _import_reference()
    vdir = Path(gwv.__file__).parent / "validators"
    targets = {str(p): p.name for p in vdir.glob("*.py") if p.name != "__init__.py"}

    hits: dict[str, set[int]] = {name: set() for name in targets.values()}

    def tracer(frame, event, arg):
        fname = frame.f_code.co_filename
        name = targets.get(fname)
        if name is not None:
            if event == "line":
                hits[name].add(frame.f_lineno)
            return tracer
        return tracer if event == "call" else None

    from gwv_spark.corpus import CORPUS_TS, gen_record

    _fuzz_records = load_generator("test_fuzz_parity.py", "_fuzz_records")
    _geom_records = load_generator("test_geom_fuzz.py", "_geom_records")

    def run_ref(records, rule_ids):
        data = {name: (related, g) for name, related, g in records}
        dump = gwv.dump.Dump(data, CORPUS_TS)
        gwv.validator.validate(dump, rule_ids)

    sys.settrace(tracer)
    try:
        # 1. the standard corpus (what the driver oracle sees at sf0.01)
        run_ref([gen_record(i, 5000) for i in range(5000)], ALL_RULES)
        std = {k: set(v) for k, v in hits.items()}
        # 2. grammar fuzz: default seeds 1-3 + the extended windows
        for seed in [1, 2, 3] + list(range(200, 200 + n_grammar)):
            run_ref(_fuzz_records(seed, 120), FUZZ_RULES)
        # 2b. directed branch records (tests/test_directed_branches.py)
        d_src = (REPO / "tests" / "test_directed_branches.py").read_text()
        d_src = d_src[: d_src.index("def test_")]
        d_src = "\n".join(
            l for l in d_src.splitlines() if not l.startswith("from tests.")
        )
        d_ns: dict = {}
        exec(compile(d_src, "test_directed_branches.py:data", "exec"), d_ns)
        run_ref(d_ns["DIRECTED_RECORDS"], FUZZ_RULES)
        run_ref(d_ns["DIRECTED_GEOM_RECORDS"], GEOM_RULES)
        # 3. geometry fuzz: default seeds 11-14 + the extended windows
        for seed in [11, 12, 13, 14] + list(range(100, 100 + n_geom)):
            run_ref(_geom_records(seed, 120), GEOM_RULES)
    finally:
        sys.settrace(None)

    report = {}
    tot_exe = tot_hit = 0
    for fname, name in sorted(targets.items(), key=lambda kv: kv[1]):
        exe = executable_lines(Path(fname))
        hit = hits[name] & exe
        tot_exe += len(exe)
        tot_hit += len(hit)
        report[name] = {
            "executable": len(exe),
            "hit_std_corpus": len(std[name] & exe),
            "hit_total": len(hit),
            "pct": round(100 * len(hit) / len(exe), 1) if exe else 100.0,
            "unhit_lines": sorted(exe - hit)[:40],
        }
        print(
            f"{name:<16} {len(hit):>4}/{len(exe):<4} "
            f"{report[name]['pct']:>5}%  (std corpus alone: "
            f"{report[name]['hit_std_corpus']})"
        )

    out = {
        "target": "reference gwv/validators/*.py, whole files",
        "inputs": {
            "std_corpus_docs": 5000,
            "grammar_seeds": f"[1,2,3] + 200..{199 + n_grammar}",
            "geom_seeds": f"[11,12,13,14] + 100..{99 + n_geom}",
        },
        "total_pct": round(100 * tot_hit / tot_exe, 1),
        "files": report,
    }
    (REPO / "COVERAGE_validators.json").write_text(json.dumps(out, indent=1))
    print(f"\ntotal: {tot_hit}/{tot_exe} = {out['total_pct']}%")
    print("wrote COVERAGE_validators.json")


if __name__ == "__main__":
    main()
