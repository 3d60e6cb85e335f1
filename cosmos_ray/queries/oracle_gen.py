"""DuckDB oracle CTEs reconstructing the synthetic corpus goldens in SQL.

The pages generator (`sources/pages.py`) plants every structural draw as
integer modular arithmetic on ``doc_id`` (``pages._h``), and the fixed KB
(`sources/entity_dict.py`) is seed-pinned — so the golden block list,
fact list and entity links are expressible as plain SQL over the driver's
``documents`` table plus literal VALUES for the KB. The driver runs these
oracles side-by-side with the Ray pipelines (rows + schema + value-hash),
turning the whole kg_* query family from rows-only checks into
value-verified ones.

Layout parity: seg_id = block index, page = seg_id // 12, and the
synthetic 1920-px geometry (`stages/segment.py:synthetic_bboxes`) uses
only integer-valued float32 coordinates (72 + (seg%12)*148, 72+6*len,
...), so centroid/midline distances computed here in DOUBLE are exactly
equal to the engine's float32-derived values.

Everything in this module is a pure string builder — no Ray, no DuckDB
import; the driver executes the returned SQL itself.
"""

from __future__ import annotations

from functools import lru_cache

from cosmos_ray.sources.entity_dict import (
    UNKNOWN_SURFACES,
    build_entity_dict,
    surface_index,
)
from cosmos_ray.sources.pages import _H_MOD, MALFORMED_MOD, MALFORMED_REM, PREDICATES

_N_ENT = 120  # build_entity_dict default


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _H(k_expr: str) -> str:
    """SQL for pages._h(did, k): the planted-draw hash."""
    return (
        f"((did*1000003 + ({k_expr})*10007 + did*({k_expr})*7919 + 12345) % {_H_MOD})"
    )


def _str_list(items) -> str:
    return "[" + ", ".join(_q(x) for x in items) + "]"


@lru_cache(maxsize=1)
def _kb_values() -> tuple[str, str, str]:
    """(kb VALUES, surf VALUES, kbname VALUES) literals from the pinned KB."""
    kb = build_entity_dict()
    rows = kb.to_pylist()
    kb_vals = ", ".join(
        f"({i}, {_q(r['name'])}, {_str_list(r['aliases'])})" for i, r in enumerate(rows)
    )
    sidx = surface_index(kb)  # first-wins alias resolution, same as the linker
    surf_vals = ", ".join(
        f"({_q(surface)}, {_q(cid)})" for surface, (cid, _score) in sidx.items()
    )
    name_vals = ", ".join(f"({_q(r['canonical_id'])}, {_q(r['name'])})" for r in rows)
    return kb_vals, surf_vals, name_vals


@lru_cache(maxsize=1)
def kb_types_values() -> str:
    """(canonical_id, type) VALUES literal from the pinned KB — each
    synthetic entity carries exactly one type (types[0]); queries that
    need ontology constraints embed this as their own CTE."""
    kb = build_entity_dict()
    return ", ".join(
        f"({_q(r['canonical_id'])}, {_q(r['types'][0])})"
        for r in kb.to_pylist())


@lru_cache(maxsize=1)
def golden_ctes() -> str:
    """The shared WITH-clause body: kb/surf/kbname/base/facts/blocks.

    Callers embed it as ``f"WITH {golden_ctes()}, extra AS (...) SELECT"``
    (add RECURSIVE after WITH if the query's own CTEs need it)."""
    kb_vals, surf_vals, name_vals = _kb_values()
    M = _H_MOD
    preds = _str_list(PREDICATES)
    unk = _str_list(UNKNOWN_SURFACES)
    npred = len(PREDICATES)
    nunk = len(UNKNOWN_SURFACES)
    return f"""
kb(idx, name, aliases) AS (VALUES {kb_vals}),
surf(surface, canonical_id) AS (VALUES {surf_vals}),
kbname(canonical_id, name) AS (VALUES {name_vals}),
base AS (
  SELECT doc_id AS did,
         'https://web' || (doc_id % 20) || '.example.org/p/' || doc_id AS url,
         text, lang, source,
         string_split(text, ' ') AS ws
  FROM documents
  WHERE doc_id % {MALFORMED_MOD} != {MALFORMED_REM}
),
fexp AS (
  SELECT did, url, unnest(range(0, 2 + {_H("4")} % 7)) AS f FROM base
),
fdraw AS (
  SELECT did, url, f,
         {_H("10+6*f")} AS hs, {_H("11+6*f")} AS ha, {_H("12+6*f")} AS hp,
         {_H("13+6*f")} AS ho, {_H("14+6*f")} AS hb
  FROM fexp
),
facts AS (
  SELECT d.did, d.url, d.f,
         CASE WHEN d.ha % 4 = 0 AND len(ks.aliases) > 0
              THEN ks.aliases[1 + (d.ha // 4) % len(ks.aliases)]
              ELSE ks.name END AS subj,
         ({preds})[1 + d.hp % {npred}] AS pred,
         CASE WHEN d.ho % 25 < 3
              THEN ({unk})[1 + (d.ho // 25) % {nunk}]
              WHEN d.hb % 4 = 0 AND len(ko.aliases) > 0
              THEN ko.aliases[1 + (d.hb // 4) % len(ko.aliases)]
              ELSE ko.name END AS obj
  FROM fdraw d
  JOIN kb ks ON ks.idx = ({_N_ENT} * d.hs * d.hs) // ({M}::BIGINT * {M})
  LEFT JOIN kb ko ON d.ho % 25 >= 3 AND ko.idx = d.ho % {_N_ENT}
),
bsrc AS (
  SELECT *, (len(ws) + 39) // 40 AS npar,
         ({_H("1")} % 5 < 2) AS ht,
         {_H("2")} % 100 AS m1, {_H("3")} % 100 AS m2
  FROM base
),
rawblocks(did, url, grp, sub, tag, btext) AS (
  SELECT did, url, 0, 0, 'h1',
         'Document ' || did || ' & notes: ' || array_to_string(ws[1:3], ' ') FROM bsrc
  UNION ALL SELECT did, url, 1, 0, 'p', 'source: ' || source FROM bsrc
  UNION ALL SELECT did, url, 2, 0, 'h2', 'Overview' FROM bsrc
  UNION ALL SELECT did, url, 3, i, 'p', array_to_string(ws[(40*i+1):(40*i+40)], ' ')
            FROM (SELECT did, url, ws, unnest(range(0, npar)) AS i FROM bsrc)
  UNION ALL SELECT did, url, 4, 0, 'h2', 'Data' FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 5, 0, 'td', 'metric' FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 5, 1, 'td', 'value' FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 5, 2, 'td', 'alpha score ' || m1 FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 5, 3, 'td', 'beta score ' || m2 FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 6, 0, 'p',
         'Table ' || (1 + did % 3) || ': alpha and beta scores.' FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 7, 0, 'p',
         'See table ' || (1 + did % 3) || ' for the alpha and beta scores.' FROM bsrc WHERE ht
  UNION ALL SELECT did, url, 8, 0, 'h2', 'Facts' FROM bsrc
  UNION ALL SELECT did, url, 9, f, 'li', subj || ' ' || pred || ' ' || obj || '.' FROM facts
  UNION ALL SELECT did, url, 10, 0, 'p',
         'Table ' || (1 + did % 3) || ': summary of planted facts.' FROM bsrc WHERE NOT ht
  UNION ALL SELECT did, url, 11, 0, 'p',
         'Figure ' || (1 + did % 2) || ': entity graph sketch.' FROM bsrc
  UNION ALL SELECT did, url, 12, 0, 'h2', 'Model' FROM bsrc WHERE did % 4 = 1
  UNION ALL SELECT did, url, 13, 0, 'pre',
         'gamma = alpha + ' || (did % 7) || ' * beta' FROM bsrc WHERE did % 4 = 1
  UNION ALL SELECT did, url, 14, 0, 'p',
         '(' || (1 + did % 3) || '.' || (did % 5) || ')' FROM bsrc WHERE did % 4 = 1
  UNION ALL SELECT did, url, 15, 0, 'p', 'Closing note on hyphena-' FROM bsrc WHERE did % 5 = 2
  UNION ALL SELECT did, url, 16, 0, 'p', 'tion handling in this corpus.' FROM bsrc WHERE did % 5 = 2
),
blocks AS (
  SELECT did, url,
         CAST(row_number() OVER (PARTITION BY url ORDER BY grp, sub) - 1 AS INT) AS seg_id,
         tag, btext AS text,
         CASE WHEN tag = 'p' THEN
                CASE WHEN regexp_matches(btext, '^(?i)(table|tbl|tab)\\.? ?[0-9]')
                     THEN 'Table Caption'
                     WHEN regexp_matches(btext, '^(?i)(figure|fig|scheme|plate)\\.? ?[0-9]')
                     THEN 'Figure Caption'
                     ELSE 'Body Text' END
              WHEN tag = 'h1' THEN 'Title'
              WHEN tag = 'h2' THEN 'Section Header'
              WHEN tag = 'li' THEN 'List Item'
              WHEN tag = 'td' THEN 'Table'
              WHEN tag = 'pre' THEN 'Equation'
              ELSE 'Other' END AS cls
  FROM rawblocks
)"""


@lru_cache(maxsize=1)
def layout_ctes() -> str:
    """SQL replay of the synthetic layout (`stages/segment.py`):
    ``lay`` = blocks + page/pos + the two-column draw
    (``_h(did, 97+page) % 3 == 0`` vetoed when a td-run or a pre+label
    pair would straddle the column break / page edge) + integer-valued
    box coordinates (x1, y1, x2, y2) and centroid (cx, cy). Splice after
    ``golden_ctes()``; single-column pages keep the original
    72 + pos*148 stack, two-column pages place pos 0-5 / 6-11 at
    x1 = 72 / 1032 with a 296-px row pitch."""
    draw = _H("97 + b.seg_id // 12")
    return f"""
lveto AS (
  SELECT url, seg_id // 12 AS pg,
         (bool_or(seg_id % 12 = 5 AND tag = 'td')
          AND bool_or(seg_id % 12 = 6 AND tag = 'td'))
         OR bool_or(seg_id % 12 = 11 AND tag = 'td')
         OR bool_or(seg_id % 12 = 5 AND tag = 'pre')
         OR bool_or(seg_id % 12 = 11 AND tag = 'pre') AS veto
  FROM blocks GROUP BY url, seg_id // 12),
lgeo AS (
  SELECT b.*, CAST(b.seg_id // 12 AS INT) AS page, b.seg_id % 12 AS pos,
         (({draw}) % 3 = 0) AND NOT v.veto AS twocol
  FROM blocks b JOIN lveto v ON v.url = b.url AND v.pg = b.seg_id // 12),
lgeo2 AS (
  SELECT *,
    CASE WHEN twocol THEN 72.0 + (pos // 6) * 960.0 ELSE 72.0 END AS x1,
    CASE WHEN twocol THEN 72.0 + (pos % 6) * 296.0
         ELSE 72.0 + pos * 148.0 END AS y1
  FROM lgeo),
lay AS (
  SELECT *, least(x1 + 6.0 * length(text),
                  CASE WHEN twocol THEN x1 + 816.0 ELSE 1848.0 END) AS x2,
         y1 + 24.0 AS y2,
         (x1 + least(x1 + 6.0 * length(text),
                     CASE WHEN twocol THEN x1 + 816.0 ELSE 1848.0 END)) / 2.0 AS cx,
         y1 + 12.0 AS cy
  FROM lgeo2)"""


def with_goldens(body: str, recursive: bool = False) -> str:
    """Wrap a query body (which may reference facts/blocks/kb/surf/kbname
    and define further CTEs via a leading ', name AS (...)') in the shared
    golden WITH clause."""
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} {golden_ctes()}{body}"
