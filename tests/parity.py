"""Differential-parity helpers: run the reference implementation and the
Spark engine on the same corpus and compare canonicalized results."""

from __future__ import annotations

import json


def run_reference(reference_gwv, records, rule_ids):
    from gwv.dump import Dump
    from gwv.validator import validate

    from gwv_spark.corpus import CORPUS_TS

    data = {name: (related, gdata) for name, related, gdata in records}
    dump = Dump(data, CORPUS_TS)
    return validate(dump, rule_ids)


def run_engine(spark, documents_df, rule_ids, attrs_df=None, dims=None):
    from gwv_spark import engine

    ctx = engine.make_context(spark, documents_df, attrs=attrs_df, dims=dims)
    violations = engine.run_rules(ctx, rule_ids)
    rows = [r.asDict() for r in violations.collect()]
    return engine.result_json(rows, rule_ids)


def canon(result: dict) -> dict:
    """Order-insensitive canonical form: within each errcode, sort the
    violation rows by their JSON serialization (the reference's row order
    inside an errcode depends on dict/set iteration details we do not
    promise to reproduce)."""
    def norm_param(p):
        # set-derived list params (e.g. mj expected sets) have no defined
        # order in the reference — sort all-string lists on both sides
        if isinstance(p, (list, tuple)) and all(isinstance(x, str) for x in p):
            return sorted(p)
        if isinstance(p, tuple):
            return list(p)
        return p

    out = {}
    for rule, payload in result.items():
        res = {}
        for code, rows in payload["result"].items():
            res[code] = sorted(json.dumps([norm_param(x) for x in r]) for r in rows)
        out[rule] = {"timestamp": payload["timestamp"], "result": res}
    return out


def assert_parity(reference_result, engine_result, rule_ids):
    ref = canon(reference_result)
    eng = canon(engine_result)
    for rid in rule_ids:
        assert eng[rid] == ref[rid], _diff(rid, ref[rid], eng[rid])


def _diff(rid, ref, eng, limit=10):
    lines = [f"rule {rid} mismatch"]
    codes = sorted(set(ref["result"]) | set(eng["result"]))
    for code in codes:
        r = ref["result"].get(code, [])
        e = eng["result"].get(code, [])
        if r == e:
            continue
        only_ref = [x for x in r if x not in e][:limit]
        only_eng = [x for x in e if x not in r][:limit]
        lines.append(f"  code {code}: ref={len(r)} eng={len(e)}")
        for x in only_ref:
            lines.append(f"    ref-only: {x}")
        for x in only_eng:
            lines.append(f"    eng-only: {x}")
    return "\n".join(lines)
