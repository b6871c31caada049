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
