"""DuckDB SQL mirrors of the gwv rules — independent re-implementations
used as correctness oracles by the driver gate.

These are deliberately written against DuckDB's list/regex functions
(RE2), not translated Spark plans, so a bug in the Spark expression tree
and a bug here would have to coincide to slip through.
"""

from __future__ import annotations


def kint(c: str) -> str:
    """kageIntSuppressError as DuckDB SQL (parse.py mirrors the same
    semantics for Spark)."""
    return (
        f"(CASE WHEN trim({c}) = '' THEN 0 "
        f"WHEN regexp_matches(trim({c}), '^[+-]?[0-9](_?[0-9])*$') "
        f"THEN TRY_CAST(replace(trim({c}), '_', '') AS INTEGER) END)"
    )


_TOGO = [
    (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81D), (0x2B820, 0x2CEAD),
    (0x2CEB0, 0x2EBE0), (0x2EBF0, 0x2EE5D), (0x30000, 0x3134A),
    (0x31350, 0x323AF), (0x323B0, 0x33479),
]
_COMPAT = [0xFA0E, 0xFA0F, 0xFA11, 0xFA13, 0xFA14, 0xFA1F,
           0xFA21, 0xFA23, 0xFA24, 0xFA27, 0xFA28, 0xFA29]
_GOKAN = [(0xF900, 0xFA6D), (0xFA70, 0xFAD9), (0x2F800, 0x2FA1D)]

RE_REGIONS = "(?:[gtvh]v?|[mis]|k[pv]?|u[ks]?|j[asvn]?)"


def category_case() -> str:
    togo = " OR ".join(f"(cp BETWEEN {lo} AND {hi})" for lo, hi in _TOGO)
    compat = ",".join(map(str, _COMPAT))
    gokan = " OR ".join(f"(cp BETWEEN {lo} AND {hi})" for lo, hi in _GOKAN)
    return f"""
      CASE WHEN contains(doc_id, '_') THEN 'user-owned'
           WHEN regexp_matches(doc_id, '^(u2ff[0-9a-f]|u31ef)-.+$') THEN 'ids'
           WHEN regexp_matches(doc_id, '^u([0-9a-f]{{4,6}})(-.+)?$') THEN (
             CASE WHEN ({togo}) OR cp IN ({compat})
                       OR (({gokan}) AND cp NOT IN ({compat}))
                  THEN 'ucs-kanji' ELSE 'ucs-hikanji' END)
           WHEN regexp_matches(doc_id, '^(cdp[on]?)-([0-9a-f]{{4}})(-.+)?$') THEN 'cdp'
           WHEN regexp_matches(doc_id, '^koseki-([0-9]{{6}})$') THEN 'koseki'
           WHEN regexp_matches(doc_id, '^toki-([0-9]{{8}})$') THEN 'toki'
           WHEN regexp_matches(doc_id, '^irg(2015|2017|2021)-([0-9]{{5}})$') THEN 'ext'
           WHEN regexp_matches(doc_id, '^unstable-bsh-([0-9a-f]{{4}})$') THEN 'bsh'
           ELSE 'other' END
    """


def docs_cte(parquet_expr: str) -> str:
    """Common prepared-docs CTE: gdata, entity_ref, category, flags."""
    k1 = kint("string_split(s.text, ':')[1]")
    k2 = kint("string_split(s.text, ':')[2]")
    return f"""
    docs0 AS (SELECT * FROM {parquet_expr}),
    docs AS (
      SELECT doc_id, spans,
        array_to_string(list_transform(spans, s -> s.text), '$') AS gdata,
        len(spans) AS n_spans,
        CASE WHEN len(spans) = 1
                  AND starts_with(spans[1].text, '99:0:0:0:0:200:200:')
                  AND NOT contains(substr(spans[1].text, 20), ':')
             THEN substr(spans[1].text, 20) END AS entity_ref,
        {category_case()} AS category,
        (len(list_filter(spans, s ->
            len(string_split(s.text, ':')) >= 2
            AND {k1} = 0 AND {k2} IN (97, 98, 99))) > 0) AS has_transform
      FROM (SELECT doc_id, spans,
                   COALESCE(TRY_CAST(('0x' || regexp_extract(doc_id,
                     '^u([0-9a-f]{{4,6}})(-.+)?$', 1)) AS UBIGINT), 0)::BIGINT AS cp
            FROM docs0)
    )
    """


RE1_DELVAR = "^(.+)-(?:(?:var|itaiji)-[0-9]{3}|[0-9]{2})$"
RE2_DELVAR = "^(u[0-9a-f]{4,5}-" + RE_REGIONS + ")[0-9]{2}$"
RE3_DELVAR = "^(u[0-9a-f]{4,5}|cdp[on]?-[0-9a-f]{4})-.+$"


def delvar_sql(parquet_expr: str) -> str:
    return f"""
    WITH {docs_cte(parquet_expr)},
    derived AS (
      SELECT doc_id,
        CASE WHEN regexp_matches(doc_id, '{RE1_DELVAR}') THEN regexp_extract(doc_id, '{RE1_DELVAR}', 1)
             WHEN regexp_matches(doc_id, '{RE2_DELVAR}') THEN regexp_extract(doc_id, '{RE2_DELVAR}', 1)
             WHEN regexp_matches(doc_id, '{RE3_DELVAR}') THEN regexp_extract(doc_id, '{RE3_DELVAR}', 1)
        END AS base
      FROM docs
      WHERE category NOT IN ('user-owned', 'koseki', 'toki', 'ext', 'bsh')
    )
    SELECT doc_id, base FROM derived
    WHERE base IS NOT NULL AND base NOT IN (SELECT doc_id FROM docs)
    """


RE_VARS_ORDER = "-" + RE_REGIONS + "?([0-9]{2})(?:-(?:var|itaiji)-[0-9]{3})?(?:@|$)"


def order_sql(parquet_expr: str) -> str:
    kf = kint("string_split(ft, ':')[1]")
    kl = kint("string_split(lt, ':')[1]")
    return f"""
    WITH {docs_cte(parquet_expr)},
    cand AS (
      SELECT doc_id, spans[1].text AS ft, spans[len(spans)].text AS lt
      FROM docs
      WHERE entity_ref IS NULL AND category <> 'user-owned'
        AND NOT has_transform AND n_spans > 1
    ),
    parts AS (
      SELECT doc_id,
        CASE WHEN {kf} = 99 AND len(string_split(ft, ':')) >= 8
             THEN string_split(ft, ':')[8] END AS fp,
        CASE WHEN {kl} = 99 AND len(string_split(lt, ':')) >= 8
             THEN string_split(lt, ':')[8] END AS lp
      FROM cand
    ),
    h AS (
      SELECT doc_id, fp, lp,
             regexp_extract(fp, '{RE_VARS_ORDER}', 1) AS fh,
             regexp_extract(lp, '{RE_VARS_ORDER}', 1) AS lh
      FROM parts
    ),
    coded AS (
      SELECT doc_id, fp, lp,
        COALESCE(
          CASE WHEN fp IS NOT NULL THEN
            CASE WHEN fh = '02' THEN '2'
                 WHEN fh IN ('04','14','24') THEN '4'
                 WHEN fh = '06' THEN '6' END END,
          CASE WHEN lp IS NOT NULL THEN
            CASE WHEN lh = '01' THEN '11'
                 WHEN lh = '03' THEN '13'
                 WHEN lh IN ('05','10','11','15') THEN '15' END END
        ) AS errcode
      FROM h
    )
    SELECT doc_id, errcode,
           CASE WHEN errcode IN ('2','4','6') THEN fp ELSE lp END AS part_name
    FROM coded WHERE errcode IS NOT NULL
    """


def kosekitoki_sql(parquet_expr: str) -> str:
    return f"""
    WITH {docs_cte(parquet_expr)},
    toki AS (
      SELECT doc_id, entity_ref, substr(doc_id, 6) AS num
      FROM docs WHERE category = 'toki' AND substr(doc_id, 6, 2) = '00'
    ),
    t2 AS (
      SELECT t.doc_id, t.entity_ref, 'koseki-' || substr(t.num, 3) AS koseki_name,
             CASE WHEN t.entity_ref IS NOT NULL AND e.doc_id IS NOT NULL
                  THEN t.entity_ref ELSE t.doc_id END AS entity
      FROM toki t LEFT JOIN docs e ON e.doc_id = t.entity_ref
    ),
    t3 AS (
      SELECT t2.*, CASE WHEN k.doc_id IS NOT NULL
                        THEN COALESCE(k.entity_ref, k.doc_id)
                        ELSE t2.koseki_name END AS koseki_entity
      FROM t2 LEFT JOIN docs k ON k.doc_id = t2.koseki_name
    )
    SELECT doc_id,
      CASE WHEN entity_ref IS NULL THEN '0'
           WHEN koseki_entity = koseki_name THEN '1' ELSE '2' END AS errcode,
      CASE WHEN entity_ref IS NULL THEN NULL
           WHEN koseki_entity = koseki_name THEN entity
           ELSE entity || '|' || koseki_entity END AS params
    FROM t3 WHERE entity <> koseki_entity
    """


def ucsalias_sql(parquet_expr: str) -> str:
    tail_vi = "^-(var|itaiji)-[0-9]{3}$"
    return f"""
    WITH {docs_cte(parquet_expr)},
    ua AS (
      SELECT doc_id, entity_ref AS entity,
             'u' || regexp_extract(doc_id, '^u([0-9a-f]{{4,6}})(-.+)?$', 1) AS nomark
      FROM docs
      WHERE entity_ref IS NOT NULL AND category IN ('ucs-kanji', 'ucs-hikanji')
    ),
    ub AS (SELECT *, substr(doc_id, len(nomark) + 1) AS tail FROM ua),
    uc AS (
      SELECT ub.*, n.doc_id IS NOT NULL AS nomark_exists,
             CASE WHEN n.doc_id IS NOT NULL
                  THEN COALESCE(n.entity_ref, n.doc_id) END AS nomark_entity
      FROM ub LEFT JOIN docs n ON n.doc_id = ub.nomark
    ),
    coded AS (
      SELECT doc_id, entity,
        CASE WHEN tail <> '' THEN
          CASE WHEN regexp_matches(tail, '{tail_vi}') THEN
                 CASE WHEN nomark_exists AND entity = nomark_entity THEN
                   CASE WHEN regexp_extract(tail, '{tail_vi}', 1) = 'var'
                        THEN '10' ELSE '20' END END
               WHEN regexp_matches(tail, '^-{RE_REGIONS}$') THEN
                 CASE WHEN entity = nomark THEN '1' END
          END
        ELSE
          CASE WHEN (NOT regexp_matches(entity, '^u[0-9a-f]+(-|$)'))
                    OR regexp_matches(entity, '^(u2ff[0-9a-f]|u31ef)-') THEN
                 CASE WHEN entity <> 'undefined' THEN '0' END
               WHEN starts_with(entity, nomark || '-')
                    AND regexp_matches(substr(entity, len(nomark) + 1), '{tail_vi}') THEN
                 CASE WHEN regexp_extract(substr(entity, len(nomark) + 1), '{tail_vi}', 1) = 'var'
                      THEN '11' ELSE '21' END
          END
        END AS errcode
      FROM uc
    )
    SELECT doc_id, errcode,
           CASE WHEN errcode = '1' THEN NULL ELSE entity END AS entity_param
    FROM coded WHERE errcode IS NOT NULL
    """


def donotuse_sql(parquet_expr: str) -> str:
    return f"""
    WITH {docs_cte(parquet_expr)},
    lines AS (
      SELECT doc_id, unnest(spans, recursive := true)
      FROM docs WHERE entity_ref IS NULL
    ),
    q AS (
      SELECT doc_id, "offset", string_split(text, ':')[8] AS part_full, media_ref AS base
      FROM lines WHERE kind = 'part' AND len(string_split(text, ':')) >= 8
    ),
    bad AS (
      SELECT q.* FROM q JOIN docs t ON t.doc_id = q.base
      WHERE contains(t.gdata, 'do-not-use')
    )
    SELECT doc_id, string_agg(part_full, '|' ORDER BY "offset") AS parts
    FROM bad GROUP BY doc_id
    """


def mustrenew_sql(parquet_expr: str) -> str:
    return f"""
    WITH {docs_cte(parquet_expr)},
    lines AS (
      SELECT doc_id, unnest(spans, recursive := true)
      FROM docs WHERE entity_ref IS NULL AND category <> 'user-owned'
    ),
    q AS (
      SELECT DISTINCT doc_id, string_split(text, ':')[8] AS part_full, media_ref AS base
      FROM lines
      WHERE kind = 'part' AND len(string_split(text, ':')) >= 8
        AND contains(string_split(text, ':')[8], '@')
    ),
    j AS (
      SELECT q.part_full, q.doc_id,
             COALESCE(contains(t.gdata, '@'), false) AS is_old
      FROM q LEFT JOIN docs t ON t.doc_id = q.base
    )
    SELECT part_full AS part_name,
           CASE WHEN bool_or(is_old) THEN '@' ELSE '0' END AS errcode,
           string_agg(DISTINCT doc_id, '|' ORDER BY doc_id) AS quoters
    FROM j GROUP BY part_full
    """


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def width_sql(
    parquet_expr: str,
    groups: dict[str, list[str]],
    buhin_widths: dict[str, tuple[float, float]],
) -> str:
    """width rule (width.py:93-156): effective horizontal extent vs
    registered width class.  The order-dependent extent fold (a
    nonspacing part copies the RUNNING min/max, width.py:132-134) runs
    as list_reduce over the per-doc element list sorted by line order.
    Emits (doc_id, errcode)."""
    nonspacing = sorted(groups.get("NonSpacingGlyphs-Halfwidth", []))
    half = sorted(
        set(groups.get("HalfwidthGlyphs-BMP", []))
        | set(groups.get("HalfwidthGlyphs-SMP", []))
        | set(groups.get("HalfwidthGlyphs-nonUCS", []))
        | set(groups.get("HalfwidthGlyphs-sans", []))
    )

    def dwidth(c: str) -> str:
        ns = ", ".join(_sql_str(s) for s in nonspacing) or "''"
        hf = ", ".join(_sql_str(s) for s in half) or "''"
        return (
            f"(CASE WHEN {c} IN ({ns}) THEN 0 "
            f"WHEN {c} IN ({hf}) THEN 1 ELSE 2 END)"
        )

    buhin_a = "CASE " + " ".join(
        f"WHEN gn = {_sql_str(p)} THEN xl + w * {lo} / 200.0"
        for p, (lo, _) in buhin_widths.items()
    ) + " END"
    buhin_b = "CASE " + " ".join(
        f"WHEN gn = {_sql_str(p)} THEN xl + w * {hi} / 200.0"
        for p, (_, hi) in buhin_widths.items()
    ) + " END"

    re_half = r"^uff(6[1-9a-f]|[7-9a-d][0-9a-f]|e[89a-e])$"
    re_full = r"^uff([0-5][0-9a-f]|60|e[0-6])$"
    re_hen = "-" + RE_REGIONS + r"?01(-(var|itaiji)-|$)"

    def is_half(c: str) -> str:
        return f"(ends_with({c}, '-halfwidth') OR regexp_matches({c}, '{re_half}'))"

    def is_full(c: str) -> str:
        return f"(ends_with({c}, '-fullwidth') OR regexp_matches({c}, '{re_full}'))"

    return f"""
    WITH {docs_cte(parquet_expr)},
    cand AS (
      SELECT doc_id, spans FROM docs
      WHERE category NOT IN ('ids', 'ucs-kanji', 'cdp', 'koseki', 'ext', 'bsh')
        AND NOT has_transform
    ),
    lines0 AS (
      SELECT doc_id, s.text AS text, s.offset AS off, s.media_ref AS gn,
        list_transform(string_split(s.text, ':'), c -> {kint("c")}) AS d0
      FROM cand, unnest(spans) AS u(s)
    ),
    lines1 AS (
      SELECT * EXCLUDE (d0),
        CASE WHEN d0[1] = 99
             THEN list_transform(d0, (x, i) ->
                    CASE WHEN i = 8 THEN NULL ELSE x END)
             ELSE d0 END AS d
      FROM lines0
    ),
    lines2 AS (
      SELECT *, d[1] AS st, len(d) AS dn,
        floor((len(d) - 3) / 2.0)::INT AS n_pairs
      FROM lines1
      WHERE d[1] IS NULL OR d[1] <> 0
    ),
    lines3 AS (
      SELECT *
      FROM lines2
      WHERE CASE WHEN st = 99
                 THEN dn >= 7 AND d[4] IS NOT NULL AND d[5] IS NOT NULL
                      AND d[6] IS NOT NULL AND d[7] IS NOT NULL
                 ELSE n_pairs > 0 AND len(list_filter(range(0, n_pairs),
                      i -> d[4 + 2 * i] IS NULL OR d[5 + 2 * i] IS NULL)) = 0
            END
        AND (st IS NULL OR st <> 99 OR gn IS NOT NULL)
    ),
    elems0 AS (
      SELECT doc_id, off, gn, st,
        CASE WHEN st = 99 THEN NULL
             ELSE list_min(list_filter(list_transform(range(0, n_pairs),
                  i -> d[4 + 2 * i]), x -> x IS NOT NULL))::DOUBLE END AS smin,
        CASE WHEN st = 99 THEN NULL
             ELSE list_max(list_filter(list_transform(range(0, n_pairs),
                  i -> d[4 + 2 * i]), x -> x IS NOT NULL))::DOUBLE END AS smax,
        d[4]::DOUBLE AS xl, (d[6] - d[4])::DOUBLE AS w,
        {dwidth("gn")} AS dw,
        ({is_full("gn")} OR (gn || '-halfwidth') IN (SELECT doc_id FROM docs))
          AS wide_quote,
        ({buhin_a}) AS ba, ({buhin_b}) AS bb
      FROM lines3
    ),
    elems AS (
      SELECT doc_id, off,
        CASE WHEN st = 99 AND dw = 0 AND ba IS NULL THEN 'N' ELSE 'V' END AS typ,
        CASE WHEN st <> 99 OR st IS NULL THEN smin
             WHEN ba IS NOT NULL THEN ba
             WHEN dw = 0 THEN NULL
             WHEN dw = 2 AND wide_quote THEN xl + w * 0.31
             WHEN dw = 2 THEN xl + w * 0.06
             ELSE xl + w * 0.06 END AS a,
        CASE WHEN st <> 99 OR st IS NULL THEN smax
             WHEN bb IS NOT NULL THEN bb
             WHEN dw = 0 THEN NULL
             WHEN dw = 2 AND wide_quote THEN xl + w * 0.69
             WHEN dw = 2 THEN xl + w * 0.94
             ELSE xl + w * 0.44 END AS b
      FROM elems0
    ),
    folded AS (
      SELECT doc_id,
        list_reduce(
          list_prepend(
            {{'mn': 'infinity'::DOUBLE, 'mx': '-infinity'::DOUBLE,
              'typ': NULL::VARCHAR, 'a': NULL::DOUBLE, 'b': NULL::DOUBLE}},
            list(
              {{'mn': NULL::DOUBLE, 'mx': NULL::DOUBLE,
                'typ': typ, 'a': a, 'b': b}} ORDER BY off)),
          (acc, e) -> {{
            'mn': CASE WHEN e.typ = 'N' THEN least(acc.mn, acc.mx)
                       ELSE least(acc.mn, e.a, e.b) END,
            'mx': CASE WHEN e.typ = 'N' THEN greatest(acc.mx, acc.mn)
                       ELSE greatest(acc.mx, e.a, e.b) END,
            'typ': NULL::VARCHAR, 'a': NULL::DOUBLE, 'b': NULL::DOUBLE}}
        ) AS mm
      FROM elems GROUP BY doc_id
    ),
    verdict AS (
      SELECT c.doc_id,
        CASE WHEN {is_full("c.doc_id")} THEN 0.0
             WHEN {is_half("c.doc_id")} THEN 0.0
             WHEN regexp_matches(c.doc_id, '{re_hen}') THEN 0.0
             ELSE COALESCE(f.mm.mn, 'infinity'::DOUBLE) END AS minx,
        CASE WHEN {is_full("c.doc_id")} THEN 200.0
             WHEN {is_half("c.doc_id")} THEN 100.0
             WHEN regexp_matches(c.doc_id, '{re_hen}') THEN 200.0
             ELSE COALESCE(f.mm.mx, '-infinity'::DOUBLE) END AS maxx,
        {dwidth("c.doc_id")} AS gwidth
      FROM cand c LEFT JOIN folded f ON f.doc_id = c.doc_id
    )
    SELECT doc_id, gwidth::VARCHAR AS errcode
    FROM verdict
    WHERE maxx <> '-infinity'::DOUBLE
      AND (maxx <= 110 AND minx < 90) <> (gwidth <> 2)
    """


def j_sql(
    parquet_expr: str,
    cjksrc: dict[str, list],
    no_use_pairs: list[tuple[str, str]],
    no_apply_re: str | None,
    source_sep: list[str],
) -> str:
    """j rule (j.py:73-195): region suffix vs Unihan source columns,
    jv/kv restrictions, nomark-entity equality, j/jv coexistence, and
    the banned-part scan of the entity's spans — with the jv-config
    dims expanded through one-level alias closures over the corpus
    (dump.get_alias_of semantics, j.py:79-99).  Emits
    (doc_id, errcode, params)."""
    regions_re = "^-((?:[gtvh]v?|[mis]|k[pv]?|u[ks]?|j[asvn]?))([0-9]{2})?$"
    region2col = {
        "g": 0, "t": 1, "j": 2, "k": 3, "kp": 4, "v": 5,
        "h": 6, "m": 7, "u": 8, "s": 9, "uk": 10,
    }
    cjk_vals = ", ".join(
        "(" + ", ".join(
            [_sql_str(u)]
            + [
                (_sql_str(c) if c is not None else "NULL")
                for c in ([cols[2], cols[3]] + list(cols[0:11]))
            ]
        ) + ")"
        for u, cols in sorted(cjksrc.items())
    ) or "('', " + ", ".join(["NULL"] * 13) + ")"
    src_cols = ", ".join(f"src{i}" for i in range(11))
    nu_vals = ", ".join(
        f"({_sql_str(nu)}, {_sql_str(use)}, {i})"
        for i, (nu, use) in enumerate(no_use_pairs)
    ) or "('', '', 0)"
    sep_vals = ", ".join(_sql_str(s) for s in source_sep) or "''"
    gokan = " OR ".join(f"(cp BETWEEN {lo} AND {hi})" for lo, hi in _GOKAN)
    compat_inset = ",".join(map(str, _COMPAT))
    region_src = "CASE region " + " ".join(
        f"WHEN '{r}' THEN src{i}" for r, i in sorted(region2col.items())
    ) + " END"
    na_seeds = (
        f"SELECT doc_id AS part FROM docs WHERE regexp_matches(doc_id, {_sql_str(no_apply_re)})"
        if no_apply_re
        else "SELECT '' AS part WHERE FALSE"
    )
    return f"""
    WITH {docs_cte(parquet_expr)},
    cjk(ucs, jsource, ksource, {src_cols}) AS (VALUES {cjk_vals}),
    nu_seeds(part, use, idx) AS (VALUES {nu_vals}),
    no_use AS (
      -- last config entry wins (reference dict-comprehension overwrite)
      SELECT banned, max_by(use, idx) AS use FROM (
        SELECT part AS banned, use, idx FROM nu_seeds
        UNION ALL
        SELECT d.doc_id, s.use, s.idx FROM nu_seeds s
        JOIN docs d ON d.entity_ref = s.part
      ) GROUP BY banned
    ),
    na_seeds AS ({na_seeds}),
    no_apply AS (
      SELECT DISTINCT part AS na_part FROM (
        SELECT part FROM na_seeds
        UNION ALL
        SELECT d.doc_id FROM na_seeds s JOIN docs d ON d.entity_ref = s.part
      )
    ),
    probe AS (
      SELECT ucs, max(nomark_entity) AS nomark_entity, max(has_j) AS has_j,
             max(has_ja) AS has_ja, max(ucs_no_apply) AS ucs_no_apply
      FROM (
        SELECT doc_id AS ucs, COALESCE(entity_ref, doc_id) AS nomark_entity,
               NULL::BOOLEAN AS has_j, NULL::BOOLEAN AS has_ja,
               NULL::BOOLEAN AS ucs_no_apply
        FROM docs
        UNION ALL
        SELECT substr(doc_id, 1, len(doc_id) - 2), NULL, TRUE, NULL, NULL
        FROM docs WHERE ends_with(doc_id, '-j')
        UNION ALL
        SELECT substr(doc_id, 1, len(doc_id) - 3), NULL, NULL, TRUE, NULL
        FROM docs WHERE ends_with(doc_id, '-ja')
        UNION ALL
        SELECT na_part, NULL, NULL, NULL, TRUE FROM no_apply
      ) GROUP BY ucs
    ),
    jv_parts AS (
      SELECT ent AS entity,
        CASE WHEN bool_or(na_part IS NOT NULL) THEN TRUE END AS ent_has_no_apply,
        min(CASE WHEN banned IS NOT NULL THEN {{'o': off, 'bp': banned, 'pp': use}} END).bp
          AS banned_part,
        min(CASE WHEN banned IS NOT NULL THEN {{'o': off, 'bp': banned, 'pp': use}} END).pp
          AS preferred_part
      FROM (
        SELECT l.doc_id AS ent, l.off, na.na_part, nu.banned, nu.use
        FROM (
          SELECT doc_id, s.offset AS off,
                 string_split(string_split(s.text, ':')[8], '@')[1] AS pbase
          FROM docs, unnest(spans) AS u(s)
          WHERE {kint("string_split(s.text, ':')[1]")} = 99
            AND len(string_split(s.text, ':')) >= 8
        ) l
        LEFT JOIN no_apply na ON na.na_part = l.pbase
        LEFT JOIN no_use nu ON nu.banned = l.pbase
        WHERE na.na_part IS NOT NULL OR nu.banned IS NOT NULL
      ) GROUP BY ent
    ),
    base AS (
      SELECT doc_id, category, entity_ref,
        CASE WHEN entity_ref IS NOT NULL AND tgt IS NOT NULL
             THEN entity_ref ELSE doc_id END AS entity,
        CASE WHEN regexp_extract(doc_id, '^u([0-9a-f]{{4,6}})(-.+)?$', 1) <> ''
             THEN 'u' || regexp_extract(doc_id, '^u([0-9a-f]{{4,6}})(-.+)?$', 1)
        END AS ucs
      FROM (SELECT d.doc_id, d.category, d.entity_ref, t.doc_id AS tgt
            FROM docs d LEFT JOIN docs t ON t.doc_id = d.entity_ref)
      WHERE category IN ('ucs-kanji', 'ext', 'bsh')
    ),
    b1 AS (
      SELECT b.*, substr(b.doc_id, len(b.ucs) + 1) AS tail,
        c.jsource, c.ksource, {src_cols}
      FROM base b LEFT JOIN cjk c ON c.ucs = b.ucs
    ),
    b2 AS (
      SELECT b.*, nullif(regexp_extract(tail, '{regions_re}', 1), '') AS region,
        (regexp_extract(tail, '{regions_re}', 2) <> '') AS is_henka,
        (b.ucs IN ({sep_vals})) AS in_source_sep,
        (SELECT ({gokan}) AND cp NOT IN ({compat_inset}) FROM
          (SELECT TRY_CAST(('0x' || substr(b.ucs, 2)) AS UBIGINT)::BIGINT AS cp))
          AS gokan,
        p.nomark_entity, p.has_j, p.has_ja, p.ucs_no_apply,
        jp.ent_has_no_apply, jp.banned_part, jp.preferred_part
      FROM b1 b
      LEFT JOIN probe p ON p.ucs = b.ucs
      LEFT JOIN jv_parts jp ON jp.entity = b.entity
    ),
    b3 AS (
      SELECT *,
        (CASE WHEN ent_has_no_apply IS NULL AND banned_part IS NOT NULL
              THEN '2' END) AS check_jv,
        {region_src} AS region_src,
        (CASE WHEN is_henka THEN '41' ELSE '40' END) AS no_source
      FROM b2
    ),
    b4 AS (
      SELECT *,
        CASE WHEN region = 'jv' THEN (
               CASE WHEN jsource IS NOT NULL THEN '30'
                    WHEN in_source_sep THEN '5' END)
             WHEN region = 'kv' THEN
               (CASE WHEN ksource IS NOT NULL THEN '31' END)
             WHEN region IN ('gv', 'tv', 'vv', 'hv', 'jn') THEN '~'
             WHEN region IN ('j', 'ja') THEN
               (CASE WHEN jsource IS NULL THEN no_source END)
             WHEN region IN ('g','t','j','k','kp','v','h','m','u','s','uk') THEN
               (CASE WHEN region_src IS NULL THEN no_source END)
             ELSE '~' END AS src_stage,
        (nomark_entity IS NOT NULL AND entity <> nomark_entity
         AND NOT is_henka) AS nomark_diff
      FROM b3
    ),
    coded AS (
      SELECT doc_id,
        CASE WHEN category IN ('bsh', 'ext') THEN check_jv
             WHEN ucs IS NULL THEN NULL
             WHEN tail = '' THEN (
               CASE WHEN gokan THEN NULL
                    WHEN jsource IS NULL AND ucs_no_apply IS NULL
                         AND NOT in_source_sep THEN check_jv END)
             WHEN region IS NULL THEN NULL
             WHEN src_stage IS NOT NULL THEN src_stage
             WHEN region NOT IN ('j', 'ja', 'jv') THEN NULL
             ELSE (
               CASE WHEN nomark_entity IS NULL THEN NULL
                    WHEN nomark_diff THEN '0'
                    WHEN region <> 'jv' THEN NULL
                    WHEN has_j IS NOT NULL THEN '1j'
                    WHEN has_ja IS NOT NULL THEN '1ja'
                    WHEN ucs_no_apply IS NULL THEN check_jv END)
        END AS ec,
        banned_part, preferred_part, jsource, ksource
      FROM b4
    )
    SELECT doc_id,
      CASE WHEN ec IN ('1j', '1ja') THEN '1' ELSE ec END AS errcode,
      CASE ec WHEN '2' THEN banned_part || '|' || preferred_part
              WHEN '30' THEN jsource
              WHEN '31' THEN ksource
              WHEN '1j' THEN 'j'
              WHEN '1ja' THEN 'ja'
              ELSE '' END AS params
    FROM coded WHERE ec IS NOT NULL AND ec <> '~'
    """


def mj_sql(
    parquet_expr: str,
    attrs_expr: str,
    classifiers: list[tuple[int, str, int, str]],
    keyed: list[tuple[int, str]],
    xref: list[tuple[int, str, int, list[str]]],
    raw_ucs: list[tuple[int, str, str, bool]],
) -> str:
    """mj rule (mj.py:222-281): name→(field,key) classification against
    the MJ cross-reference table (inlined as VALUES from the same dim
    the engine loads), entity consistency, and expected-UCS 'related'
    checks with the non-togo resolution of mj.py:262-269.  Emits
    (doc_id, errcode)."""
    re_ids = r"^(u2ff[0-9a-f]|u31ef)-.+$"

    def classify(n: str) -> tuple[str, str]:
        fw, kw = [], []
        for f_id, pat, grp, prefix in classifiers:
            m = f"regexp_matches({n}, {_sql_str(pat)})"
            if f_id == 6:  # F_UCS excludes IDS names
                m += f" AND NOT regexp_matches({n}, {_sql_str(re_ids)})"
            k = n if grp == 0 else f"regexp_extract({n}, {_sql_str(pat)}, {grp})"
            if prefix:
                k = f"'{prefix}' || {k}"
            fw.append(f"WHEN {m} THEN {f_id}")
            kw.append(f"WHEN {m} THEN lower({k})")
        return (
            "CASE " + " ".join(fw) + " END",
            "CASE " + " ".join(kw) + " END",
        )

    f_doc, k_doc = classify("doc_id")
    f_ent, k_ent = classify("entity_ref")

    keyed_vals = ", ".join(f"({f}, {_sql_str(k)})" for f, k in keyed) or "(-1, '')"
    xref_vals = ", ".join(
        f"({kf}, {_sql_str(k)}, {gf}, [{', '.join(_sql_str(g) for g in gws)}])"
        for kf, k, gf, gws in xref
    ) or "(-1, '', -1, ['']::VARCHAR[])"
    ucs_vals = ", ".join(
        f"({f}, {_sql_str(k)}, {_sql_str(u)}, {str(t).upper()})"
        for f, k, u, t in raw_ucs
    ) or "(-1, '', '', FALSE)"

    return f"""
    WITH {docs_cte(parquet_expr)},
    attrs AS (SELECT doc_id, related FROM {attrs_expr}),
    keyed(field, key) AS (VALUES {keyed_vals}),
    xref(kfield, key, gfield, gws) AS (VALUES {xref_vals}),
    ucs1(field, key, ucs, is_togo) AS (VALUES {ucs_vals}),
    resolved AS (
      SELECT field, key, list(resolved ORDER BY resolved) AS ucs_expected
      FROM (
        SELECT DISTINCT u.field, u.key,
          CASE WHEN u.is_togo THEN u.ucs
               WHEN d.doc_id IS NOT NULL
               THEN COALESCE(a.related, 'u3013') ELSE 'u3013' END AS resolved
        FROM ucs1 u
        LEFT JOIN docs d ON d.doc_id = u.ucs
        LEFT JOIN attrs a ON a.doc_id = u.ucs
      ) WHERE resolved <> 'u3013'
      GROUP BY field, key
    ),
    base AS (
      SELECT doc_id, entity_ref,
        (entity_ref IS NOT NULL) AS is_alias,
        CASE WHEN entity_ref IS NOT NULL AND tgt IS NOT NULL
             THEN entity_ref ELSE doc_id END AS entity,
        {f_doc} AS field, {k_doc} AS key
      FROM (
        SELECT d.doc_id, d.entity_ref, d.category, t.doc_id AS tgt
        FROM docs d LEFT JOIN docs t ON t.doc_id = d.entity_ref
      )
      WHERE category NOT IN ('user-owned', 'ids', 'cdp', 'ext', 'bsh')
    ),
    b1 AS (
      SELECT * FROM base WHERE field IS NOT NULL
    ),
    b2 AS (
      SELECT b.*, (k.field IS NOT NULL) AS has_idx,
        {f_ent} AS e_field, {k_ent} AS e_key
      FROM b1 b LEFT JOIN keyed k USING (field, key)
    ),
    b3 AS (
      SELECT b.*,
        (b.entity_ref IS NOT NULL
         AND NOT regexp_matches(b.doc_id, '-itaiji-[0-9]{{3}}$')
         AND b.e_field IS NOT NULL AND b.e_field <> b.field) AS check_entity,
        xe.gws AS entity_expected,
        xo.gws AS expected_from_entity
      FROM b2 b
      LEFT JOIN xref xe ON xe.kfield = b.field AND xe.key = b.key
                        AND xe.gfield = b.e_field
      LEFT JOIN xref xo ON xo.kfield = b.e_field AND xo.key = b.e_key
                        AND xo.gfield = b.field
    ),
    b4 AS (
      SELECT b.*, r.ucs_expected,
        COALESCE(ao.related, 'u3013') AS related,
        COALESCE(ae.related, 'u3013') AS entity_related
      FROM b3 b
      LEFT JOIN resolved r USING (field, key)
      LEFT JOIN attrs ao ON ao.doc_id = b.doc_id
      LEFT JOIN attrs ae ON ae.doc_id = b.entity
    ),
    b5 AS (
      SELECT *,
        CASE WHEN related = 'u3013' AND is_alias
             THEN entity_related ELSE related END AS eff_related,
        CASE WHEN e_field = 6 THEN string_split(entity_ref, '-')[1]
             ELSE entity_ref END AS entity_base,
        CASE WHEN field = 6 THEN string_split(doc_id, '-')[1]
             ELSE doc_id END AS own_base
      FROM b4
    ),
    coded AS (
      SELECT doc_id,
        CASE WHEN (NOT has_idx) AND field = 0 AND key < '090000' THEN '3'
             WHEN NOT has_idx THEN NULL
             WHEN check_entity
                  AND entity_expected IS NOT NULL AND len(entity_expected) > 0
                  AND NOT list_contains(entity_expected, entity_base)
                  AND expected_from_entity IS NOT NULL
                  AND len(expected_from_entity) > 0
                  AND NOT list_contains(expected_from_entity, own_base) THEN '0'
             WHEN ucs_expected IS NOT NULL AND len(ucs_expected) > 0 THEN (
               CASE WHEN eff_related = 'u3013' THEN '2'
                    WHEN NOT list_contains(ucs_expected, eff_related) THEN '1'
               END)
        END AS errcode
      FROM b5
    )
    SELECT doc_id, errcode FROM coded WHERE errcode IS NOT NULL
    """


def naming_sql(
    parquet_expr: str,
    rules_cfg: dict,
    cdp_dict: dict[str, str],
) -> str:
    """naming rule (naming.py:102-169): suffix stripping, prohibition
    tiers, IDS grammar reduction to 漢 (iterated regex replace, same
    16-round unroll as the engine), encoded-CDP lookup, PUA/u3013
    rejects, 4-tier acceptance + deprecated.  Emits
    (doc_id, errcode, params)."""

    def ruleset(name_expr: str, key: str) -> str:
        rs = rules_cfg[key]
        parts = []
        if rs["strings"]:
            lst = ", ".join(_sql_str(s) for s in sorted(rs["strings"]))
            parts.append(f"{name_expr} IN ({lst})")
        if rs["regex"]:
            parts.append(
                f"regexp_full_match({name_expr}, {_sql_str('(?:' + rs['regex'] + ')')})"
            )
        return "(" + (" OR ".join(parts) or "FALSE") + ")"

    re_gl = r"^(j78|j83|j90|jsp|jx1-200[04]|jx2|k0|g0|c[0-9a-f])-([0-9a-f]{4})$"
    re_valid_gl = r"^(2[1-9a-f]|[3-6][0-9a-f]|7[0-9a-e]){2}$"
    re_cdp = r"\bcdp([on]?)-([0-9a-f]{4})\b"
    re_valid_cdp = (
        r"^(8[1-9a-f]|9[0-9a-f]|a0|c[67])(a[1-9a-f]|[4-6b-e][0-9a-f]|[7f][0-9a-e])$"
    )
    re_ids_head = r"^(kumimoji|u2ff[0-9a-f]|u31ef)-"
    re_kanji = (
        r"\b(?:u[23]?[0-9a-f]{4}(?:-u(?:e01[0-9a-f]{2}|fe0[0-9a-f]))?"
        r"|cdp[on]?-[0-9a-f]{4})\b"
    )
    reduced = "regexp_replace(name, '^kumimoji-', '')"
    for pat, rep in [
        (r"\bu2ff[ef]\b", "１"),
        (r"\b(u2ff[014-9a-d]|u31ef)\b", "２"),
        (r"\bu2ff[23]\b", "３"),
        (re_kanji, "漢"),
    ]:
        reduced = f"regexp_replace({reduced}, {_sql_str(pat)}, '{rep}', 'g')"
    for _ in range(16):
        reduced = (
            f"regexp_replace({reduced}, '１-漢|２-漢-漢|３-漢-漢-漢', '漢', 'g')"
        )

    keys_list = "[" + ", ".join(_sql_str(k) for k in cdp_dict) + "]"
    if cdp_dict:
        enc_ucs_case = (
            "CASE enc_cdp "
            + " ".join(
                f"WHEN {_sql_str(k)} THEN {_sql_str(v)}" for k, v in cdp_dict.items()
            )
            + " END"
        )
    else:
        enc_ucs_case = "NULL"

    return f"""
    WITH {docs_cte(parquet_expr)},
    n0 AS (
      SELECT doc_id,
        regexp_replace(doc_id, '-(var|itaiji)-[0-9]{{3}}$', '') AS n1
      FROM docs WHERE category <> 'user-owned'
    ),
    n1 AS (
      SELECT doc_id, (n1 <> doc_id) AS is_var,
        regexp_replace(n1, '-[0-9]{{2}}$', '') AS name,
        (regexp_replace(n1, '-[0-9]{{2}}$', '') <> n1) AS is_henka
      FROM n0
    ),
    n2 AS (
      SELECT *, {reduced} AS reduced,
        regexp_extract(name, {_sql_str(re_gl)}, 2) AS gl4,
        list_filter(
          list_transform(regexp_extract_all(name, {_sql_str(re_cdp)}, 0),
            c -> CASE WHEN regexp_matches(c, '^cdp[on]')
                        AND NOT list_contains({keys_list}, c)
                      THEN 'cdp-' || substr(c, -4) ELSE c END),
          c -> list_contains({keys_list}, c))[1] AS enc_cdp
      FROM n1
    ),
    n3 AS (
      SELECT *, {enc_ucs_case} AS enc_ucs,
        ({ruleset("name", "dont-create")}
         OR (gl4 <> '' AND NOT regexp_matches(gl4, {_sql_str(re_valid_gl)}))
         OR (gl4 = '' AND len(list_filter(
               regexp_extract_all(name, {_sql_str(re_cdp)}, 2),
               n -> NOT regexp_matches(n, {_sql_str(re_valid_cdp)}))) > 0)
        ) AS prohibited,
        regexp_matches(name, {_sql_str(re_ids_head)}) AS is_ids,
        (len(list_filter(
           regexp_extract_all(name, '\\bu[23]?[0-9a-f]{{4}}\\b', 0),
           u -> u = 'u3013' OR (u >= 'ue000' AND u <= 'uf8ff'))) > 0) AS bad_ucs,
        ({ruleset("name", "rule")}
         OR (NOT is_var AND {ruleset("name", "rule-novar")})
         OR (NOT is_henka AND {ruleset("name", "rule-nohenka")})
         OR (NOT is_var AND NOT is_henka
             AND {ruleset("name", "rule-novar-nohenka")})) AS tier_ok,
        {ruleset("name", "deprecated-rule")} AS deprecated
      FROM n2
    ),
    coded AS (
      SELECT doc_id, reduced, enc_cdp, enc_ucs,
        CASE WHEN prohibited THEN '2'
             WHEN is_ids THEN (
               CASE WHEN reduced <> '漢' THEN '1'
                    WHEN enc_cdp IS NOT NULL THEN '3'
                    WHEN bad_ucs THEN '1' END)
             WHEN tier_ok THEN NULL
             WHEN deprecated THEN '4'
             ELSE '0' END AS errcode
      FROM n3
    )
    SELECT doc_id, errcode,
      CASE errcode WHEN '1' THEN reduced
                   WHEN '3' THEN enc_cdp || '|' || enc_ucs
                   ELSE '' END AS params
    FROM coded WHERE errcode IS NOT NULL
    """


def related_sql(
    parquet_expr: str,
    attrs_expr: str,
    compat_pairs: list[tuple[str, str]],
) -> str:
    """related rule (related.py:52-92): expected related = own codepoint,
    remapped through kCompatibilityVariant for compat ideographs; checks
    the doc's related, the alias target's existence, and the target's
    related.  The cjksrc compat column is inlined as VALUES from the
    same dim the engine uses."""
    togo = " OR ".join(f"(ecp BETWEEN {lo} AND {hi})" for lo, hi in _TOGO)
    compat_inset = ",".join(map(str, _COMPAT))
    gokan = " OR ".join(f"(cp BETWEEN {lo} AND {hi})" for lo, hi in _GOKAN)
    if compat_pairs:
        compat_values = ", ".join(f"('{u}', '{c}')" for u, c in compat_pairs)
    else:
        compat_values = "('', '')"
    re_ucs = "^u([0-9a-f]{4,6})(-.+)?$"
    return f"""
    WITH {docs_cte(parquet_expr)},
    attrs AS (SELECT doc_id, related FROM {attrs_expr}),
    compat(cucs, compat) AS (VALUES {compat_values}),
    base AS (
      SELECT d.doc_id, d.entity_ref,
        COALESCE(a.related, 'u3013') AS related,
        'u' || regexp_extract(d.doc_id, '{re_ucs}', 1) AS exp0,
        TRY_CAST(('0x' || regexp_extract(d.doc_id, '{re_ucs}', 1)) AS UBIGINT)::BIGINT AS cp
      FROM docs d LEFT JOIN attrs a USING (doc_id)
      WHERE d.category = 'ucs-kanji'
    ),
    b2 AS (
      SELECT b.*, c.compat,
        (({gokan}) AND cp NOT IN ({compat_inset})) AS is_gokan
      FROM base b LEFT JOIN compat c ON b.exp0 = c.cucs
    ),
    b3 AS (
      SELECT *, CASE WHEN is_gokan THEN 'u' || lower(substr(compat, 3))
                     ELSE exp0 END AS expected
      FROM b2 WHERE NOT (is_gokan AND compat IS NULL)
    ),
    b4 AS (
      SELECT b3.*,
        (e.doc_id IS NOT NULL) AS ent_exists,
        CASE WHEN e.doc_id IS NOT NULL
             THEN COALESCE(ea.related, 'u3013') END AS ent_related,
        (NOT contains(b3.entity_ref, '_')
         AND NOT regexp_matches(b3.entity_ref, '^(u2ff[0-9a-f]|u31ef)-.+$')
         AND regexp_matches(b3.entity_ref, '{re_ucs}')
         AND (SELECT ({togo}) OR ecp IN ({compat_inset}) FROM (SELECT
              TRY_CAST(('0x' || regexp_extract(b3.entity_ref, '{re_ucs}', 1))
              AS UBIGINT)::BIGINT AS ecp))) AS ent_togo
      FROM b3
      LEFT JOIN docs e ON e.doc_id = b3.entity_ref
      LEFT JOIN attrs ea ON ea.doc_id = b3.entity_ref
    ),
    coded AS (
      SELECT *,
        CASE WHEN related <> 'u3013' AND related <> expected THEN '0'
             WHEN entity_ref IS NOT NULL THEN (
               CASE WHEN ent_togo THEN NULL
                    WHEN NOT ent_exists THEN '2'
                    WHEN ent_related = 'u3013' THEN '11'
                    WHEN expected <> ent_related THEN '10' END)
             WHEN related = 'u3013' THEN '1' END AS errcode
      FROM b4
    )
    SELECT doc_id, errcode,
      CASE errcode
        WHEN '0' THEN related || '|' || expected
        WHEN '1' THEN expected
        WHEN '2' THEN entity_ref
        WHEN '10' THEN entity_ref || '|' || ent_related || '|' || expected
        WHEN '11' THEN entity_ref || '|' || expected END AS params
    FROM coded WHERE errcode IS NOT NULL
    """


_KEIJO_KUMIAWASE = [
    (1, 0, 0), (1, 0, 2), (1, 0, 32), (1, 0, 13), (1, 0, 23), (1, 0, 4),
    (1, 0, 313), (1, 0, 413), (1, 0, 24), (1, 2, 0), (1, 2, 2), (1, 32, 0),
    (1, 32, 32), (1, 32, 13), (1, 32, 23), (1, 32, 4), (1, 32, 313),
    (1, 32, 413), (1, 32, 24), (1, 12, 0), (1, 12, 32), (1, 12, 13),
    (1, 12, 23), (1, 12, 313), (1, 12, 413), (1, 12, 24), (1, 22, 0),
    (1, 22, 32), (1, 22, 13), (1, 22, 23), (1, 22, 4), (1, 22, 313),
    (1, 22, 413), (1, 22, 24), (2, 0, 7), (2, 0, 5), (2, 32, 7), (2, 32, 4),
    (2, 32, 5), (2, 12, 7), (2, 22, 7), (2, 22, 4), (2, 22, 5), (2, 7, 0),
    (2, 7, 8), (2, 7, 4), (2, 27, 0), (3, 0, 0), (3, 0, 5), (3, 0, 32),
    (3, 32, 0), (3, 32, 5), (3, 32, 32), (3, 12, 0), (3, 12, 5), (3, 12, 32),
    (3, 22, 0), (3, 22, 5), (3, 22, 32), (4, 0, 0), (4, 0, 5), (4, 22, 0),
    (4, 22, 5), (6, 0, 7), (6, 0, 5), (6, 32, 7), (6, 32, 4), (6, 32, 5),
    (6, 12, 7), (6, 22, 7), (6, 22, 4), (6, 22, 5), (6, 7, 0), (6, 7, 8),
    (6, 7, 4), (6, 27, 0), (7, 0, 7), (7, 32, 7), (7, 12, 7), (7, 22, 7),
    (0, 0, 0), (0, -1, -1), (0, 99, 1), (0, 99, 2), (0, 99, 3), (0, 98, 0),
    (0, 97, 0), (9, 0, 0),
]
_HIKANJI_EXTRA = [(2, 32, 0), (6, 32, 0), (2, 32, 8), (6, 32, 8)]


def illegal_sql(parquet_expr: str) -> str:
    """illegal rule (illegal.py:333-365): per-line schema validation
    (arity per stroke type, type-0 forms, geometry sanity, allowed
    (stype, head, tail) combos) + whole-record alias-like / blank-like
    codes 7/8.  Emits (doc_id, errcode, detail_key) matching the Spark
    query projection.  Independent DuckDB re-implementation — mirrors
    the reference semantics, not the Spark expression tree."""
    combos = ", ".join(f"'{a},{b},{c}'" for a, b, c in _KEIJO_KUMIAWASE)
    combos_hk = ", ".join(
        f"'{a},{b},{c}'" for a, b, c in _KEIJO_KUMIAWASE + _HIKANJI_EXTRA
    )
    yoko = (
        "((d[5] = d[7] AND d[4] <> d[6]) OR "
        "(-(d[6] - d[4]) < (d[7] - d[5]) AND (d[7] - d[5]) < (d[6] - d[4])))"
    )
    # per-span class for alias-like (illegal.py:102-138) over the parsed
    # int list `d` of ONE line
    stretch_ok = """
      (len(d) >= 7 AND d[4] = 0 AND d[5] = 0 AND d[6] = 200 AND d[7] = 200
       AND d[2] IS NOT NULL AND d[3] IS NOT NULL
       AND (CASE WHEN d[2] > 100
                 THEN len(d) >= 11 AND d[10] IS NOT NULL AND d[11] IS NOT NULL
                 ELSE TRUE END)
       AND (((CASE WHEN d[2] > 100 THEN d[2] - 200 ELSE d[2] END) = 0 AND d[3] = 0)
         OR ((CASE WHEN d[2] > 100 THEN d[2] - 200 ELSE d[2] END)
               = (CASE WHEN d[2] > 100 THEN d[10] ELSE 0 END)
             AND d[3] = (CASE WHEN d[2] > 100 THEN d[11] ELSE 0 END))))
    """
    return f"""
    WITH {docs_cte(parquet_expr)},
    d2 AS (
      SELECT doc_id, spans, n_spans,
        (entity_ref IS NOT NULL) AS is_alias,
        (category = 'ucs-hikanji' OR (category = 'koseki'
          AND substr(doc_id, 8, 1) = '9')) AS is_hikanji
      FROM docs WHERE category <> 'user-owned'
    ),
    lines0 AS (
      SELECT doc_id, is_alias, is_hikanji, n_spans,
             s.text AS text, s.offset AS off,
             list_transform(string_split(s.text, ':'),
                            c -> {kint("c")}) AS d0
      FROM d2, unnest(spans) AS u(s)
    ),
    lines1 AS (
      SELECT * EXCLUDE (d0),
        CASE WHEN d0[1] = 99
             THEN list_transform(d0, (x, i) ->
                    CASE WHEN i = 8 THEN NULL ELSE x END)
             ELSE d0 END AS d
      FROM lines0
    ),
    lines2 AS (
      SELECT *, len(d) AS dn, d[1] AS st,
        concat_ws(',', d[2], d[3]) AS pair12,
        CASE WHEN is_hikanji AND d[1] >= 0 THEN d[1] % 100 ELSE d[1] END AS st_eff,
        CASE WHEN is_hikanji AND d[2] >= 0 THEN d[2] % 100 ELSE d[2] END AS s0,
        CASE WHEN is_hikanji AND d[3] >= 0 THEN d[3] % 100 ELSE d[3] END AS s1,
        CASE WHEN st_eff = 1 THEN 7 WHEN st_eff IN (2, 3, 4) THEN 9
             WHEN st_eff IN (6, 7) THEN 11 WHEN st_eff = 9 THEN 7 END AS exp,
        floor((len(d) - 3) / 2.0)::INT AS n_pairs
      FROM lines1
    ),
    lines3 AS (
      SELECT *,
        (len(list_filter(d[exp + 1:],
             x -> x IS NULL OR x <> 0)) > 0) AS extras_nonzero,
        concat_ws(',', st_eff, s0, s1) AS combo,
        CASE WHEN n_pairs <= 0 THEN TRUE
             ELSE len(list_filter(range(0, n_pairs), i ->
                  d[4 + 2 * i] IS NULL OR d[5 + 2 * i] IS NULL)) = 0
        END AS pairs_ok
      FROM lines2
    ),
    coded AS (
      SELECT doc_id, off, text,
        CASE
          WHEN st = 99 THEN (CASE WHEN dn NOT IN (8, 11) THEN '4' END)
          WHEN st = 0 THEN (
            CASE WHEN (dn = 4 AND pair12 = '0,0' AND d[4] = 0)
                   OR (dn = 4 AND pair12 = '-1,-1' AND d[4] = -1) THEN NULL
                 WHEN d[2] IS NOT NULL AND d[3] IS NOT NULL AND pair12 IN
                      ('99,1', '99,2', '99,3', '98,0', '97,0')
                   THEN (CASE WHEN dn <> 7 THEN '4' END)
                 WHEN dn NOT IN (4, 7) THEN '4'
                 WHEN pair12 IN ('0,0', '-1,-1')
                      AND d[2] IS NOT NULL AND d[3] IS NOT NULL THEN '5'
                 ELSE '6' END)
          ELSE (
            CASE WHEN st IS NULL THEN '0'
                 WHEN st_eff NOT IN (1, 2, 3, 4, 6, 7, 9) THEN '0'
                 WHEN dn < exp THEN '1'
                 WHEN dn > exp THEN (CASE WHEN extras_nonzero THEN '2' ELSE '3' END)
                 WHEN st_eff = 9 THEN '9'
                 WHEN d[2] IS NULL OR d[3] IS NULL THEN '6'
                 WHEN pairs_ok AND st_eff = 1 AND {yoko}
                      AND (s0 IN (12, 22, 32) OR s1 IN (32, 13, 23, 24, 313, 413))
                   THEN '10'
                 WHEN pairs_ok AND st_eff = 1 AND NOT {yoko}
                      AND (s0 = 2 OR s1 = 2) THEN '11'
                 WHEN pairs_ok AND st_eff = 3 AND {yoko} THEN '30'
                 WHEN pairs_ok AND st_eff = 3 AND s1 = 5 AND d[6] = d[8] THEN '31'
                 WHEN pairs_ok AND st_eff = 4 AND {yoko} THEN '40'
                 WHEN pairs_ok AND st_eff = 4 AND s1 = 5 AND d[6] >= d[8] THEN '41'
                 WHEN (CASE WHEN is_hikanji THEN combo NOT IN ({combos_hk})
                            ELSE combo NOT IN ({combos}) END) THEN '6'
            END)
        END AS errcode
      FROM lines3
    ),
    line_v AS (
      SELECT doc_id, errcode,
        array_to_string(string_split(text, ':')[1:3], ':')
          || '#' || doc_id || '#' || lpad(off::VARCHAR, 6, '0') AS detail_key
      FROM coded WHERE errcode IS NOT NULL
    ),
    cls AS (
      SELECT doc_id, any_value(is_alias) AS is_alias,
        any_value(n_spans) AS n_spans,
        bool_or(CASE
          WHEN st IS NULL OR st < 0 THEN TRUE
          WHEN st = 0 THEN (dn >= 3 AND d[2] IN (97, 98, 99))
          WHEN st = 99 THEN NOT ({stretch_ok})
          WHEN st % 100 = 9 THEN FALSE
          ELSE TRUE END) AS any_f,
        sum((st = 99 AND ({stretch_ok}))::INT) AS n_q,
        bool_and(NOT (st IS NULL OR st < 0 OR st = 99
                      OR st % 100 IN (1, 2, 3, 4, 6, 7))) AS all_blank,
        bool_or(off = 0 AND text = '0:-1:-1:-1') AS first_blank
      FROM lines2 GROUP BY doc_id
    ),
    rec_v AS (
      SELECT doc_id, '7' AS errcode, doc_id AS detail_key FROM cls
      WHERE NOT is_alias AND NOT any_f AND n_q = 1
      UNION ALL
      SELECT doc_id, '8', doc_id FROM cls
      WHERE all_blank AND NOT (n_spans = 1 AND first_blank)
    )
    SELECT * FROM line_v UNION ALL SELECT * FROM rec_v
    """


def ids_sql(parquet_expr: str) -> str:
    """ids rule (ids.py:101-197): IDC structure in the NAME vs the
    existence-checked entity's first part span.  Emits
    (doc_id, errcode, detail_key) matching the Spark query projection.

    RE2 has no lookahead, so the reference's ``(?=@|$)`` suffix regex
    (ids.py:83) is rewritten with an explicit optional ``@...`` tail
    anchored at end — same accepted set, since anything after ``@`` is
    version text."""
    re_vars = "-" + RE_REGIONS + r"?([0-9]{2})(-(var|itaiji)-[0-9]{3})?(@.*)?$"
    re_idc = "^(u2ff[0-9a-f]|u31ef)$"
    lr = "'u2ff0', 'u2ff2'"
    tb = "'u2ff1', 'u2ff3'"
    surround = "'u2ff4','u2ff5','u2ff6','u2ff7','u2ff8','u2ff9','u2ffa','u2ffc','u2ffd'"
    k = kint  # shorthand
    return f"""
    WITH {docs_cte(parquet_expr)},
    ents AS (
      SELECT d.doc_id, d.entity_ref,
        CASE WHEN d.entity_ref IS NOT NULL AND t.doc_id IS NOT NULL
             THEN d.entity_ref ELSE d.doc_id END AS entity
      FROM docs d LEFT JOIN docs t ON t.doc_id = d.entity_ref
      WHERE d.category = 'ids'
    ),
    withspans AS (
      SELECT e.doc_id, s.spans AS espans, s.spans[1].text AS ft,
             string_split(s.spans[1].text, ':') AS fcols
      FROM ents e JOIN docs s ON s.doc_id = e.entity
    ),
    parsed AS (
      SELECT doc_id, espans, ft,
        CASE WHEN len(fcols) >= 8 THEN fcols[8] END AS fp,
        {k("fcols[1]")} AS st0,
        {k("fcols[4]")} AS x1, {k("fcols[5]")} AS y1,
        {k("fcols[6]")} AS x2, {k("fcols[7]")} AS y2
      FROM withspans
      WHERE len(fcols) >= 7
    ),
    gated AS (
      SELECT doc_id, espans, ft, fp,
        CASE WHEN y1 = y2 THEN 1e308
             ELSE abs((x1 - x2)::DOUBLE / (y1 - y2)) END AS aspect,
        (x2 - x1)::DOUBLE AS dx, (y2 - y1)::DOUBLE AS dy,
        string_split(doc_id, '-') AS sname
      FROM parsed
      WHERE st0 = 99 AND len(espans) > 1
        AND x1 IS NOT NULL AND y1 IS NOT NULL
        AND x2 IS NOT NULL AND y2 IS NOT NULL AND fp IS NOT NULL
    ),
    named AS (
      SELECT *, sname[1] AS idc, sname[2] AS sn1,
        nullif(regexp_extract(fp, '{re_vars}', 1), '') AS fbt,
        list_filter(list_transform(sname, (x, i) ->
          CASE WHEN regexp_matches(x, '{re_idc}') THEN NULL ELSE i END),
          v -> v IS NOT NULL)[1] AS fki
      FROM gated
    ),
    fk AS (
      SELECT *, ((sn1 IN ({lr}) AND idc IN ({tb}))
              OR (sn1 IN ({tb}) AND idc IN ({lr}))) AS is_complicated,
        CASE WHEN fki IS NULL THEN NULL
             WHEN sname[fki::INT] = 'cdp'
             THEN 'cdp-' || sname[fki::INT + 1]
             ELSE sname[fki::INT] END AS first_kanji
      FROM named
    ),
    fkspan AS (
      SELECT f.*,
        list_filter(f.espans, s ->
          s.kind = 'part' AND s.media_ref IS NOT NULL
          AND len(string_split(s.text, ':')) >= 8
          AND starts_with(string_split(s.text, ':')[8], f.first_kanji)
        )[1].offset AS fk_off
      FROM fk f
    ),
    coded AS (
      SELECT doc_id,
        CASE
          WHEN idc IN ({lr}) THEN (
            CASE WHEN fbt IN ('03','04','09','14','24') AND dx > 175.0 THEN '1'
                 WHEN fbt = '02' THEN '2'
                 WHEN NOT is_complicated
                      AND NOT COALESCE(fbt IN ('01','08'), FALSE)
                      AND aspect > 1.8 THEN '6'
                 WHEN first_kanji IS NOT NULL AND fk_off IS NOT NULL
                      AND fk_off <> 0 THEN '3' END)
          WHEN idc IN ({tb}) THEN (
            CASE WHEN fbt IN ('01','02','08') AND dy > 175.0 THEN '10'
                 WHEN fbt IN ('04','14','24') THEN '12'
                 WHEN NOT is_complicated
                      AND NOT COALESCE(fbt IN ('03','09'), FALSE)
                      AND aspect < 0.65 THEN '15'
                 WHEN first_kanji IS NOT NULL AND fk_off IS NOT NULL
                      AND fk_off <> 0 THEN '13' END)
          WHEN idc IN ({surround}) THEN (
            CASE WHEN fbt IN ('02','06','07') THEN '22'
                 WHEN first_kanji IS NOT NULL AND fk_off IS NOT NULL
                      AND fk_off <> 0 THEN '23' END)
          WHEN idc = 'u2ffb' THEN (
            CASE WHEN first_kanji IS NOT NULL AND fk_off IS NOT NULL
                      AND fk_off <> 0 THEN '33' END)
          WHEN idc = 'u31ef' THEN NULL
          ELSE '90' END AS errcode
      FROM fkspan
    )
    SELECT doc_id, errcode, doc_id AS detail_key
    FROM coded WHERE errcode IS NOT NULL
    """


def skew_sql(parquet_expr: str) -> str:
    kc = kint("c")
    return f"""
    WITH {docs_cte(parquet_expr)},
    L AS (
      SELECT doc_id, "offset", text,
             list_transform(string_split(text, ':'), c -> {kc}) AS d
      FROM (SELECT doc_id, unnest(spans, recursive := true)
            FROM docs WHERE entity_ref IS NULL AND category <> 'user-owned')
    ),
    L2 AS (
      SELECT *, d[1] AS st, (len(d) - 3) // 2 AS np FROM L
      WHERE d[1] IN (1, 3, 4, 7)
    ),
    L3 AS (
      SELECT doc_id, "offset", text, st,
             d[4] AS x0, d[5] AS y0, d[6] AS x1, d[7] AS y1, d[8] AS x2, d[9] AS y2
      FROM L2
      WHERE np >= CASE WHEN st = 1 THEN 2 ELSE 3 END
        AND len(list_filter(range(1, np + 1),
              i -> d[2 + 2 * i] IS NULL OR d[3 + 2 * i] IS NULL)) = 0
    ),
    coded AS (
      SELECT doc_id, "offset", text,
        CASE
          WHEN st = 1 THEN
            CASE WHEN abs(x0-x1) <= abs(y0-y1) AND abs(x0-x1) != 0 AND abs(x0-x1) <= 3 THEN '11'
                 WHEN abs(x0-x1) > abs(y0-y1) AND abs(y0-y1) != 0 AND abs(y0-y1) <= 3 THEN '10' END
          WHEN st = 3 THEN
            CASE WHEN abs(x0-x1) != 0 AND abs(x0-x1) <= 3 THEN '31'
                 WHEN abs(y1-y2) != 0 AND abs(y1-y2) <= 3 THEN '30' END
          WHEN st = 4 THEN
            CASE WHEN abs(y1-y2) != 0 AND abs(y1-y2) <= 3 THEN '40' END
          WHEN st = 7 THEN
            CASE WHEN (y0 = y1 AND x0 != x1) OR (-(x1-x0) < (y1-y0) AND (y1-y0) < (x1-x0)) THEN '70'
                 WHEN ((x1-x0) = 0 AND (x2-x1) != 0)
                      OR abs((CASE WHEN x1=x0 AND y1=y0 THEN pi()/2
                                   ELSE atan2((y1-y0)::DOUBLE, (x1-x0)::DOUBLE) END)
                             - atan2((y2-y1)::DOUBLE, (x2-x1)::DOUBLE)) * 60 > 3 THEN '71'
                 WHEN (x1-x0) != 0 AND (x1-x0) BETWEEN -3 AND 3 THEN '72' END
        END AS errcode
      FROM L3
    )
    SELECT doc_id, "offset", text AS line_text, errcode
    FROM coded WHERE errcode IS NOT NULL
    """


def is_hikanji_expr() -> str:
    """helper.py:136-142 over docs_cte columns."""
    return (
        "(category = 'ucs-hikanji' "
        "OR (category = 'koseki' AND substr(doc_id, 8, 1) = '9'))"
    )


def dup_sql(parquet_expr: str) -> str:
    """Full dup-rule oracle — all six codes with single-error precedence.

    Relational mirror of dup.py:61-211: per-line segment decomposition
    for stroke types 1/3/4/7 with axis bucketing, signed
    distance-to-origin and angle, stable (dist, insertion) sort, banded
    forward scan, first overlapping near-parallel pair (codes 10 yoko /
    11 tate); PLUS the neighbor-scan codes — curves (2), double curves
    (3), same-name part groups in first-occurrence order (99), part
    position marks (9) — each a stable sort by first coordinate with
    adjacent-only comparison (dup_coords, dup.py:136-143), zip-truncated
    to the shorter coordinate list.  One violation per document picked
    by the reference precedence 10 > 11 > 2 > 3 > 99 > 9
    (SingleErrorValidator, dup.py:150-211).
    """
    kc = kint("c")
    return f"""
    WITH {docs_cte(parquet_expr)},
    gated AS (
      SELECT doc_id, spans, {is_hikanji_expr()} AS hikanji
      FROM docs
      WHERE entity_ref IS NULL AND category <> 'user-owned' AND NOT has_transform
    ),
    L AS (
      SELECT doc_id, hikanji, "offset" AS off, text,
             list_transform(string_split(text, ':'), c -> {kc}) AS d
      FROM (SELECT doc_id, hikanji, unnest(spans, recursive := true) FROM gated)
    ),
    L2 AS (
      SELECT *, d[1] AS st, (len(d) - 3) // 2 AS np FROM L
    ),
    segsrc AS (
      SELECT doc_id, hikanji, off, text, st,
             d[4] AS x0, d[5] AS y0, d[6] AS x1, d[7] AS y1, d[8] AS x2, d[9] AS y2
      FROM L2
      WHERE st IN (1, 3, 4, 7)
        AND np >= CASE WHEN st IN (1, 7) THEN 2 ELSE 3 END
        AND len(list_filter(range(1, np + 1),
              i -> d[2 + 2 * i] IS NULL OR d[3 + 2 * i] IS NULL)) = 0
    ),
    rawseg AS (
      SELECT doc_id, hikanji, off, text, off * 2 AS seq,
             x0 AS ax, y0 AS ay, x1 AS bx, y1 AS by FROM segsrc
      UNION ALL
      SELECT doc_id, hikanji, off, text, off * 2 + 1, x1, y1, x2, y2
      FROM segsrc WHERE st IN (3, 4)
    ),
    cls AS (
      SELECT *,
        CASE WHEN ay = by THEN 0
             WHEN ax = bx THEN 1
             WHEN atan2((by - ay)::DOUBLE, (bx - ax)::DOUBLE) > -pi()/4
                  AND atan2((by - ay)::DOUBLE, (bx - ax)::DOUBLE) < pi()/4 THEN 2
             WHEN atan2((by - ay)::DOUBLE, (bx - ax)::DOUBLE) > 0 THEN 3
             ELSE 4 END AS c,
        atan2((by - ay)::DOUBLE, (bx - ax)::DOUBLE) AS ang0
      FROM rawseg WHERE NOT (ax = bx AND ay = by)
    ),
    seg AS (
      SELECT doc_id, hikanji, off, text, seq,
        CASE WHEN c IN (0, 2) THEN 'yoko' ELSE 'tate' END AS kind,
        CASE WHEN c = 0 THEN (-ay)::DOUBLE
             WHEN c = 1 THEN ax::DOUBLE
             ELSE (ax * by - bx * ay)
                  / sqrt(((ax - bx) * (ax - bx) + (ay - by) * (ay - by))::DOUBLE)
        END AS dist,
        CASE WHEN c = 0 THEN 0.0
             WHEN c = 1 THEN pi()/2
             WHEN c = 4 THEN ang0 + pi()
             ELSE ang0 END AS angle,
        CASE WHEN c = 0 THEN LEAST(ax, bx)
             WHEN c = 1 THEN LEAST(ay, by)
             WHEN c = 2 THEN ax
             WHEN c = 3 THEN ay
             ELSE by END AS t0,
        CASE WHEN c = 0 THEN GREATEST(ax, bx)
             WHEN c = 1 THEN GREATEST(ay, by)
             WHEN c = 2 THEN bx
             WHEN c = 3 THEN by
             ELSE ay END AS t1
      FROM cls
    ),
    yr AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, seq) AS rn
      FROM seg WHERE kind = 'yoko'
    ),
    tr AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, seq) AS rn
      FROM seg WHERE kind = 'tate'
    ),
    yp AS (
      SELECT a.doc_id, a.off AS off1, a.text AS text1,
             b.off AS off2, b.text AS text2,
             LEAST(a.t1 - b.t0, b.t1 - a.t0, a.t1 - a.t0, b.t1 - b.t0) AS amount,
             ROW_NUMBER() OVER (PARTITION BY a.doc_id ORDER BY a.rn, b.rn) AS pick
      FROM yr a JOIN yr b ON a.doc_id = b.doc_id AND a.rn < b.rn
      WHERE b.dist - a.dist <= (CASE WHEN a.hikanji THEN 0.0 ELSE 4.0 END)
        AND abs(a.angle - b.angle) <= 1.0/60.0
        AND b.t0 <= a.t1 AND a.t0 <= b.t1
    ),
    tp AS (
      SELECT a.doc_id, a.off AS off1, a.text AS text1,
             b.off AS off2, b.text AS text2,
             LEAST(a.t1 - b.t0, b.t1 - a.t0, a.t1 - a.t0, b.t1 - b.t0) AS amount,
             ROW_NUMBER() OVER (PARTITION BY a.doc_id ORDER BY a.rn, b.rn) AS pick
      FROM tr a JOIN tr b ON a.doc_id = b.doc_id AND a.rn < b.rn
      WHERE b.dist - a.dist <= (CASE WHEN a.hikanji THEN 0.0 ELSE 9.0 END)
        AND abs(a.angle - b.angle) <= 1.0/60.0
        AND b.t0 < a.t1 AND a.t0 < b.t1
    ),
    pairsok AS (
      -- lines whose every (x,y) coordinate pair parsed (coords() is None
      -- when any member is — geom.py / kagedata.py:100-110)
      SELECT * FROM L2
      WHERE len(list_filter(range(1, np + 1),
            i -> d[2 + 2 * i] IS NULL OR d[3 + 2 * i] IS NULL)) = 0
    ),
    nb AS (
      -- neighbor-scan elements: (category, coordinate vector) per line,
      -- mirroring the dup.py:150-211 dispatch slices
      SELECT doc_id, hikanji, off, text, 'c' AS cat,
             CAST(NULL AS VARCHAR) AS pname,
             list_transform(range(1, LEAST(2 * np, 6) + 1), i -> d[3 + i]) AS cs
      FROM pairsok WHERE st = 2 AND np >= 1
      UNION ALL
      SELECT doc_id, hikanji, off, text, 'c', NULL,
             list_transform(range(3, LEAST(2 * np, 8) + 1), i -> d[3 + i])
      FROM pairsok WHERE st = 7 AND np >= 2
      UNION ALL
      SELECT doc_id, hikanji, off, text, 'c2', NULL,
             list_transform(range(1, LEAST(2 * np, 8) + 1), i -> d[3 + i])
      FROM pairsok WHERE st = 6 AND np >= 1
      UNION ALL
      SELECT doc_id, hikanji, off, text, 'pp', NULL,
             list_transform(range(1, LEAST(2 * np, 4) + 1), i -> d[3 + i])
      FROM pairsok WHERE st = 9 AND np >= 1
      UNION ALL
      -- part lines: coords are d[4..7] only; the quoted name (col 8) is
      -- the group key (kagedata.py:70-78, dup.py:204-206)
      SELECT doc_id, hikanji, off, text, 'p',
             CASE WHEN len(string_split(text, ':')) >= 8
                  THEN string_split(text, ':')[8] END,
             [d[4], d[5], d[6], d[7]]
      FROM L2 WHERE st = 99 AND len(d) >= 7
        AND d[4] IS NOT NULL AND d[5] IS NOT NULL
        AND d[6] IS NOT NULL AND d[7] IS NOT NULL
    ),
    nbr AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY doc_id, cat, pname
                           ORDER BY cs[1], off) AS rn,
        MIN(off) OVER (PARTITION BY doc_id, cat, pname) AS gmin
      FROM nb
    ),
    nph AS (
      -- adjacent-only comparison after the stable sort; zip truncates to
      -- the shorter list (dup.py:136-143)
      SELECT a.doc_id, a.cat, a.gmin, a.rn,
             a.off AS off1, a.text AS text1, b.off AS off2, b.text AS text2
      FROM nbr a JOIN nbr b
        ON a.doc_id = b.doc_id AND a.cat = b.cat
       AND a.pname IS NOT DISTINCT FROM b.pname AND b.rn = a.rn + 1
      WHERE len(list_filter(range(1, LEAST(len(a.cs), len(b.cs)) + 1),
            i -> abs(a.cs[i] - b.cs[i]) >
                 (CASE WHEN a.hikanji THEN 0 ELSE 3 END))) = 0
    ),
    nfirst AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, cat, gmin
                                   ORDER BY rn) AS pick1
      FROM nph
    ),
    ngrp AS (
      -- parts: first-occurrence group order == ascending min(offset)
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, cat
                                   ORDER BY gmin) AS pick2
      FROM nfirst WHERE pick1 = 1
    ),
    cand AS (
      SELECT doc_id, '10' AS errcode,
             off1::VARCHAR || ':' || text1 || '|' || off2::VARCHAR || ':'
             || text2 || '|' || amount::VARCHAR AS params, 0 AS prio
      FROM yp WHERE pick = 1
      UNION ALL
      SELECT doc_id, '11',
             off1::VARCHAR || ':' || text1 || '|' || off2::VARCHAR || ':'
             || text2 || '|' || amount::VARCHAR, 1
      FROM tp WHERE pick = 1
      UNION ALL
      SELECT doc_id,
             CASE cat WHEN 'c' THEN '2' WHEN 'c2' THEN '3'
                      WHEN 'p' THEN '99' ELSE '9' END,
             off1::VARCHAR || ':' || text1 || '|' || off2::VARCHAR || ':'
             || text2,
             CASE cat WHEN 'c' THEN 2 WHEN 'c2' THEN 3
                      WHEN 'p' THEN 4 ELSE 5 END
      FROM ngrp WHERE pick2 = 1
    )
    SELECT doc_id, errcode, params FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY prio) AS rp
      FROM cand
    ) WHERE rp = 1
    """


_CORNER_BOXES = {
    # (tate_pos, yoko_pos) -> tate endpoint type -> ordered tolerance
    # boxes (code_sql, xmin, xmax, ymin, ymax); '__OK__' = legitimate
    # connection, never emitted.  Mirrors corner.py:518-591.
    (0, 0): {
        12: [("'__OK__'", 0, 0, 0, 0), ("'00'", -7, 9, -5, 3)],
        22: [("'02'", -7, 9, -5, 5)],
        0: [("'08'", -7, 9, 0, 6)],
        32: [("'09'", -7, 9, -5, 0)],
    },
    (0, 2): {
        12: [("'20'", -7, 9, -5, 3)],
        22: [("'__OK__'", 0, 0, 0, 0), ("'22'", -7, 9, -5, 5)],
        0: [("'28'", -7, 9, 0, 6)],
        32: [("'29'", -7, 9, -5, 0)],
    },
    (2, 0): {
        13: [("'__OK__'", 0, 0, 0, 0), ("'11'", -8, 8, -2, 4)],
        313: [
            ("CASE WHEN isg THEN '64' ELSE '__OK__' END", 0, 0, 0, 0),
            ("'44'", -8, 8, -14, 4),
        ],
        413: [
            ("CASE WHEN ist THEN '46' ELSE '__OK__' END", 0, 0, 0, 0),
            ("'66'", -8, 8, -14, 4),
        ],
        23: [("'13'", -8, 8, -6, 4)],
        24: [("'1a'", -8, 8, -6, 4)],
        0: [("'18'", -8, 8, -19, -2), ("'48'", -8, 8, -1, 4)],
        32: [("'19'", -8, 8, 0, 4)],
    },
    (2, 2): {
        13: [("'31'", -8, 8, -2, 4)],
        313: [("'34'", -8, 8, -14, 4)],
        413: [("'36'", -8, 8, -14, 4)],
        23: [("'__OK__'", 0, 0, 0, 0), ("'33'", -8, 8, -6, 4)],
        24: [("'__OK__'", 0, 0, 0, 0), ("'aa'", -8, 8, -6, 4)],
        0: [("'38'", -8, 8, -19, -2)],
        32: [("'39'", -8, 8, -19, 0)],
    },
}

RE_G_DESIGN_SQL = "^(u[0-9a-f]+-[gi]([0-9]{2})?|zihai-[0-9]{6})$"
RE_T_DESIGN_SQL = "^(u[0-9a-f]+-[th]([0-9]{2})?|twedu-.+|lgccc-.+|hka-.+)$"


def _corner_combo_select(tpos: int, ypos: int) -> str:
    """One UNION branch: classify the (tpos, ypos) corner of every
    (tate, yoko) pair against the tolerance boxes, pre-preemption."""
    t_type = "t_hst" if tpos == 0 else "t_het"
    y_type = "y_hst" if ypos == 0 else "y_het"
    tx, ty = (f"t_x{0 if tpos == 0 else 1}", f"t_y{0 if tpos == 0 else 1}")
    yx, yy = (f"y_x{0 if ypos == 0 else 1}", f"y_y{0 if ypos == 0 else 1}")
    dx, dy = f"({yx} - {tx})", f"({yy} - {ty})"
    whens = []
    for tt, boxes in _CORNER_BOXES[(tpos, ypos)].items():
        inner = " ".join(
            f"WHEN {dx} BETWEEN {x0} AND {x1} AND {dy} BETWEEN {y0} AND {y1} "
            f"THEN {code}"
            for code, x0, x1, y0, y1 in boxes
        )
        whens.append(f"WHEN {tt} THEN (CASE {inner} END)")
    code0 = f"(CASE {t_type} {' '.join(whens)} END)"
    # -1 in data IS the no-end sentinel (_STYLE_NO_END): such a yoko
    # endpoint can never take a corner connection, same as a forced
    # segment's NULL end type
    if ypos == 2:
        # open yoko end on a horizontal-connect shape overrides any box
        # hit (incl. __OK__); at (2,2) the loop passes open_limit=0
        lim = "" if tpos == 0 else f" AND {dx} >= 0"
        code = (
            f"(CASE WHEN {code0} IS NOT NULL AND y_het = 0{lim} "
            f"THEN '78' ELSE {code0} END)"
        )
    else:
        code = code0
    where = [f"{y_type} IS NOT NULL AND {y_type} <> -1"]
    if (tpos, ypos) == (0, 0):
        # lenient top-left curve connection (corner loop): excluded from
        # the normal box classification entirely
        where.append(
            "NOT (y_stype IN (2, 6, 7) AND y_hst IS NOT NULL AND y_hst <> -1"
            " AND t_hst = 12 AND (y_x0 - t_x0) BETWEEN -7 AND 9"
            " AND (y_y0 - t_y0) BETWEEN -5 AND 3)"
        )
    if (tpos, ypos) == (2, 2):
        # the H/T-style slightly-apart pair gets its own code and skips
        # the normal classification
        a5 = (
            "(y_het = 0 AND t_het = 32 AND (y_x1 - t_x1) BETWEEN 6 AND 18"
            " AND (y_y1 - t_y1) BETWEEN 0 AND 8)"
        )
        code = (
            f"(CASE WHEN {a5} THEN 'a5' "
            f"WHEN y_het IS NOT NULL AND y_het <> -1 THEN {code} END)"
        )
        where = ["TRUE"]
    return f"""
      SELECT doc_id, {code} AS errcode, '{tpos}{ypos}' AS pos,
             t_off::VARCHAR || ':' || t_text AS tate_ref,
             y_off::VARCHAR || ':' || y_text AS yoko_ref
      FROM pairs WHERE {' AND '.join(where)}
    """


def corner_boxhits_sql(parquet_expr: str) -> str:
    """Pre-preemption corner tolerance-box hits — relational mirror of
    corner setSegments (corner.py:196-238) + the pure box classification
    of _try_connect_corner (corner.py:594-635) incl. the lenient
    top-left and H/T bottom-right specials of the validator loop, WITHOUT
    the mutable connection graph (preemption / mid-joints / ZH pass)."""
    kc = kint("c")
    combos = "\n      UNION ALL\n".join(
        _corner_combo_select(tp, yp) for tp, yp in [(0, 0), (0, 2), (2, 0), (2, 2)]
    )
    return f"""
    WITH {docs_cte(parquet_expr)},
    gated AS (
      SELECT doc_id, spans,
             regexp_matches(doc_id, '{RE_G_DESIGN_SQL}') AS isg,
             regexp_matches(doc_id, '{RE_T_DESIGN_SQL}') AS ist
      FROM docs
      WHERE entity_ref IS NULL AND category <> 'user-owned'
        AND NOT {is_hikanji_expr()} AND NOT has_transform
    ),
    L AS (
      SELECT doc_id, isg, ist, "offset" AS off, text,
             list_transform(string_split(text, ':'), c -> {kc}) AS d
      FROM (SELECT doc_id, isg, ist, unnest(spans, recursive := true) FROM gated)
    ),
    L2 AS (
      SELECT *, d[1] AS st, (len(d) - 3) // 2 AS np FROM L
      WHERE len(d) >= 3 AND d[2] IS NOT NULL AND d[3] IS NOT NULL
        AND len(list_filter(range(1, (len(d) - 3) // 2 + 1),
              i -> d[2 + 2 * i] IS NULL OR d[3 + 2 * i] IS NULL)) = 0
    ),
    -- straight segments (stroke types 1/3/4/7): head-to-second-point
    straight0 AS (
      SELECT doc_id, isg, ist, off, text, st AS stype,
             d[2] AS hst0, CASE WHEN st = 1 THEN d[3] END AS het0,
             d[4] AS ax, d[5] AS ay, d[6] AS bx, d[7] AS by
      FROM L2 WHERE st IN (1, 3, 4, 7) AND np >= 2
    ),
    straight AS (
      SELECT doc_id, isg, ist, off, text, stype,
        CASE WHEN swap THEN het0 ELSE hst0 END AS hst,
        CASE WHEN swap THEN hst0 ELSE het0 END AS het,
        CASE WHEN swap THEN bx ELSE ax END AS sx0,
        CASE WHEN swap THEN by ELSE ay END AS sy0,
        CASE WHEN swap THEN ax ELSE bx END AS sx1,
        CASE WHEN swap THEN ay ELSE by END AS sy1
      FROM (
        SELECT *, CASE WHEN (ay = by AND ax <> bx)
                            OR (-(bx - ax) < (by - ay) AND (by - ay) < (bx - ax))
                       THEN bx < ax ELSE by < ay END AS swap
        FROM straight0
      )
    ),
    straight_k AS (
      SELECT *, CASE WHEN (sy0 = sy1 AND sx0 <> sx1)
                          OR (-(sx1 - sx0) < (sy1 - sy0) AND (sy1 - sy0) < (sx1 - sx0))
                     THEN 'Y' ELSE 'T' END AS kind
      FROM straight
    ),
    -- forced segments: curve heads with corner shapes -> tate;
    -- right-to-left sweeps (tail 7) -> yoko
    forced AS (
      SELECT doc_id, isg, ist, off, text, st AS stype, d[2] AS hst,
             NULL::INTEGER AS het, d[4] AS sx0, d[5] AS sy0,
             CASE WHEN st = 2 THEN d[8] ELSE d[10] END AS sx1,
             CASE WHEN st = 2 THEN d[9] ELSE d[11] END AS sy1,
             'T' AS kind
      FROM L2
      WHERE st IN (2, 6) AND np >= (CASE WHEN st = 2 THEN 3 ELSE 4 END)
        AND d[2] IN (12, 22, 32)
      UNION ALL
      SELECT doc_id, isg, ist, off, text, st, 2, NULL,
             CASE WHEN st = 2 THEN d[8] ELSE d[10] END,
             CASE WHEN st = 2 THEN d[9] ELSE d[11] END,
             d[4], d[5], 'Y'
      FROM L2
      WHERE st IN (2, 6) AND np >= (CASE WHEN st = 2 THEN 3 ELSE 4 END)
        AND d[3] = 7 AND d[4] > (CASE WHEN st = 2 THEN d[8] ELSE d[10] END)
      UNION ALL
      SELECT doc_id, isg, ist, off, text, st, 2, NULL,
             d[10], d[11], d[6], d[7], 'Y'
      FROM L2
      WHERE st = 7 AND np >= 4 AND d[3] = 7 AND d[6] > d[10]
    ),
    seg AS (
      SELECT doc_id, isg, ist, off, text, stype, hst, het,
             sx0, sy0, sx1, sy1, kind FROM straight_k
      UNION ALL
      SELECT doc_id, isg, ist, off, text, stype, hst, het,
             sx0, sy0, sx1, sy1, kind FROM forced
    ),
    pairs AS (
      SELECT tt.doc_id, tt.isg, tt.ist,
             tt.stype AS t_stype, tt.hst AS t_hst, tt.het AS t_het,
             tt.sx0 AS t_x0, tt.sy0 AS t_y0, tt.sx1 AS t_x1, tt.sy1 AS t_y1,
             tt.off AS t_off, tt.text AS t_text,
             yy.stype AS y_stype, yy.hst AS y_hst, yy.het AS y_het,
             yy.sx0 AS y_x0, yy.sy0 AS y_y0, yy.sx1 AS y_x1, yy.sy1 AS y_y1,
             yy.off AS y_off, yy.text AS y_text
      FROM seg tt JOIN seg yy
        ON tt.doc_id = yy.doc_id AND tt.kind = 'T' AND yy.kind = 'Y'
      WHERE NOT (tt.stype IN (2, 6) AND yy.stype IN (2, 6, 7))
    ),
    hits AS (
      {combos}
    )
    SELECT doc_id, errcode, pos, tate_ref, yoko_ref
    FROM hits WHERE errcode IS NOT NULL AND errcode <> '__OK__'
    """
