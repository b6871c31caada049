"""naming — glyph-name grammar (naming.py:102-169).

Pipeline per name (gate: not user-owned):
1. strip '-(var|itaiji)-NNN' then a 2-digit henka suffix (102-113);
2. 'dont-create' rule set → "2"; invalid GL / CDP numbers → "2";
3. IDS names (kumimoji-/u2ffX-/u31ef- prefix): iterated regex reduction
   to the single symbol 漢 (127-137) → "1"; encoded-CDP lookup → "3";
   PUA / u3013 members → "1";
4. 4-tier rule-set acceptance, else deprecated → "4", else → "0".

Everything Catalyst-native: the rule sets compile to one fullmatch-
anchored rlike each (the YAML alternations are RE-compatible with Java),
the reduction loop is unrolled (name lengths bound the iteration count),
and the cdp dictionary becomes a literal map (small dim; broadcast join
at larger cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gwv_spark.rules import RuleContext, rule, shape, tag_s

_RE_GL = r"^(j78|j83|j90|jsp|jx1-200[04]|jx2|k0|g0|c[0-9a-f])-([0-9a-f]{4})$"
_RE_VALID_GL = r"^(2[1-9a-f]|[3-6][0-9a-f]|7[0-9a-e]){2}$"
_RE_CDP = r"\bcdp([on]?)-([0-9a-f]{4})\b"
_RE_VALID_CDP = r"^(8[1-9a-f]|9[0-9a-f]|a0|c[67])(a[1-9a-f]|[4-6b-e][0-9a-f]|[7f][0-9a-e])$"
_RE_IDS_HEAD = r"^(kumimoji|u2ff[0-9a-f]|u31ef)-"
_RE_IDC_1 = r"\bu2ff[ef]\b"
_RE_IDC_2 = r"\b(u2ff[014-9a-d]|u31ef)\b"
_RE_IDC_3 = r"\bu2ff[23]\b"
_RE_KANJI = r"\b(?:u[23]?[0-9a-f]{4}(?:-u(?:e01[0-9a-f]{2}|fe0[0-9a-f]))?|cdp[on]?-[0-9a-f]{4})\b"
_RE_IDS_KANJI = "１-漢|２-漢-漢|３-漢-漢-漢"
_RE_UCS_TOKEN = r"\bu[23]?[0-9a-f]{4}\b"

_REDUCTION_UNROLL = 16


def _ruleset_match(name: Column, rs: dict) -> Column:
    cond = F.lit(False)
    if rs["strings"]:
        cond = cond | name.isin(sorted(rs["strings"]))
    if rs["regex"]:
        cond = cond | name.rlike("^(?:" + rs["regex"] + ")$")
    return cond


@rule("naming")
def naming(ctx: RuleContext) -> DataFrame:
    rules_cfg = ctx.dims["naming_rules"]
    groups = ctx.dims.get("groups", {})
    it = iter(groups.get("UCSで符号化されたCDP外字", []))
    cdp_dict = dict(zip(it, it))

    docs = ctx.docs.where(F.col("category") != "user-owned").select("doc_id")
    name0 = F.col("doc_id")
    stripped_var = F.regexp_replace(name0, r"-(var|itaiji)-[0-9]{3}$", "")
    is_var = stripped_var != name0
    d = docs.withColumn("n1", stripped_var).withColumn("is_var", is_var)
    stripped_henka = F.regexp_replace(F.col("n1"), r"-[0-9]{2}$", "")
    d = d.withColumn("is_henka", stripped_henka != F.col("n1")).withColumn(
        "name", stripped_henka
    )
    name = F.col("name")

    # --- prohibition checks ("2")
    prohibited = _ruleset_match(name, rules_cfg["dont-create"])
    gl4 = F.regexp_extract(name, _RE_GL, 2)
    gl_bad = (gl4 != "") & (~gl4.rlike(_RE_VALID_GL))
    cdp_nums = F.regexp_extract_all(name, F.lit(_RE_CDP), 2)
    cdp_bad = (gl4 == "") & F.exists(cdp_nums, lambda n: ~n.rlike(_RE_VALID_CDP))

    # --- IDS branch
    is_ids = name.rlike(_RE_IDS_HEAD)
    reduced = F.regexp_replace(name, "^kumimoji-", "")
    reduced = F.regexp_replace(reduced, _RE_IDC_1, "１")
    reduced = F.regexp_replace(reduced, _RE_IDC_2, "２")
    reduced = F.regexp_replace(reduced, _RE_IDC_3, "３")
    reduced = F.regexp_replace(reduced, _RE_KANJI, "漢")
    for _ in range(_REDUCTION_UNROLL):
        reduced = F.regexp_replace(reduced, _RE_IDS_KANJI, "漢")
    d = d.withColumn("reduced", reduced)
    ids_invalid = F.col("reduced") != "漢"

    # encoded-CDP: first cdp occurrence that (after the cdpo/cdpn→cdp
    # fallback for unknown variants) appears in the dictionary
    if cdp_dict:
        mapping = F.create_map(*[F.lit(x) for kv in cdp_dict.items() for x in kv])
    else:
        mapping = F.create_map().cast("map<string,string>")
    cdp_fulls = F.regexp_extract_all(name, F.lit(_RE_CDP), 0)
    adj = F.transform(
        cdp_fulls,
        lambda c: F.when(
            c.rlike("^cdp[on]") & mapping[c].isNull(),
            F.concat(F.lit("cdp-"), F.substring(c, -4, 4)),
        ).otherwise(c),
    )
    first_encoded = F.get(F.filter(adj, lambda c: mapping[c].isNotNull()), 0)
    d = d.withColumn("enc_cdp", first_encoded).withColumn(
        "enc_ucs", mapping[F.col("enc_cdp")]
    )

    # PUA / u3013 tokens inside the IDS name
    ucs_tokens = F.regexp_extract_all(name, F.lit(_RE_UCS_TOKEN), 0)
    bad_ucs = F.exists(
        ucs_tokens,
        lambda u: (u == "u3013") | ((u >= "ue000") & (u <= "uf8ff")),
    )

    # --- rule-set tiers
    tier_ok = (
        _ruleset_match(name, rules_cfg["rule"])
        | (~F.col("is_var") & _ruleset_match(name, rules_cfg["rule-novar"]))
        | (~F.col("is_henka") & _ruleset_match(name, rules_cfg["rule-nohenka"]))
        | (
            ~F.col("is_var")
            & ~F.col("is_henka")
            & _ruleset_match(name, rules_cfg["rule-novar-nohenka"])
        )
    )
    deprecated = _ruleset_match(name, rules_cfg["deprecated-rule"])

    errcode = (
        F.when(prohibited | gl_bad | cdp_bad, F.lit("2"))
        .when(
            is_ids,
            F.when(ids_invalid, F.lit("1"))
            .when(F.col("enc_cdp").isNotNull(), F.lit("3"))
            .when(bad_ucs, F.lit("1")),
        )
        .when(tier_ok, F.lit(None).cast("string"))
        .when(deprecated, F.lit("4"))
        .otherwise(F.lit("0"))
    )
    d = d.withColumn("errcode_", errcode).where(F.col("errcode_").isNotNull())
    detail = (
        F.when(F.col("errcode_") == "1", F.array(tag_s(F.col("reduced"))))
        .when(
            F.col("errcode_") == "3",
            F.array(tag_s(F.col("enc_cdp")), tag_s(F.col("enc_ucs"))),
        )
        .otherwise(F.array().cast("array<string>"))
    )
    return shape(d, "naming", F.col("errcode_"), detail)
