"""Context enrichment: dehyphenation + table-label context mining.

Reference analogs (M7 + the table-context enrichment pass):
- dehyphenation joins ``word-\\nword`` fragments split across line breaks
  (`enrich/context_enrichment.py:162-179`);
- table-label mining extracts ``table N``-style labels from caption text
  with the reference's label regex (`context_enrichment.py:180,185-196`)
  and collects the body sentences that mention each label into a
  ``context_from_text`` column (`context_enrichment.py:180-238`), scoped
  per document (the J7 docs-with-tables semi-join shape,
  `context_enrichment.py:51-62`).

Both are separate enrichment passes over already-materialized outputs in
the reference (re-reads the parquet); here they are lazy Dataset
transforms — dehyphenation a stateless vectorized ``map_batches``
(RE2 kernel, no python loop), table context a per-url grouped apply via
the coarse-bucket shuffle helper (one hash exchange on url).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# join "xxx-\nyyy" -> "xxxyyy" (letters/digits on both sides, so real
# ranges like "2020-\n2021" also rejoin, matching the reference's
# token-level join which does not special-case numerics)
_DEHYPH_PATTERN = r"([A-Za-z0-9])-\n([A-Za-z0-9])"

# the reference's table-label regex, 'table( ){1,2}[0-9.ivxlcdm-]+'
# (`context_enrichment.py:180`), widened with the tbl/tab caption
# prefixes the rules postprocessor recognizes
_TABLE_LABEL = re.compile(r"\b(table|tbl|tab)\.? {1,2}([0-9.ivxlcdm-]+)", re.I)

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def dehyphenate_batch(t: pa.Table, col: str = "text") -> pa.Table:
    fixed = pc.replace_substring_regex(
        t.column(col), pattern=_DEHYPH_PATTERN, replacement=r"\1\2"
    )
    return t.set_column(t.schema.get_field_index(col), col, fixed)


def dehyphenate(docs_ds, col: str = "text"):
    """Vectorized dehyphenation over a text column — stateless
    ``map_batches``, zero-copy Arrow in/out."""
    return docs_ds.map_batches(
        lambda t: dehyphenate_batch(t, col), batch_format="pyarrow"
    )


def mine_table_label(text: str) -> str | None:
    """Normalized ``table N`` label from caption text, or None."""
    m = _TABLE_LABEL.search(text)
    if not m:
        return None
    return f"table {m.group(2).rstrip('.')}"


def _url_table_context(g: pd.DataFrame) -> pd.DataFrame:
    """One document's (caption label -> context sentences) rows."""
    caps = g[g["cls"] == "Table Caption"]
    if not len(caps):
        return pd.DataFrame({"url": [], "table_label": [], "context_from_text": []})
    body = g[g["cls"].isin(["Body Text", "List Item"])].sort_values("seg_id")
    sentences: list[str] = []
    for text in body["text"]:
        sentences.extend(s for s in _SENT_SPLIT.split(text) if s)
    out_url, out_lbl, out_ctx = [], [], []
    for _, cap in caps.sort_values("seg_id").iterrows():
        label = mine_table_label(cap["text"])
        if label is None:
            continue
        matches = [s for s in sentences if label in s.lower()]
        out_url.append(cap["url"])
        out_lbl.append(label)
        out_ctx.append(" ".join(matches))
    return pd.DataFrame(
        {"url": out_url, "table_label": out_lbl, "context_from_text": out_ctx}
    )


def table_context(segments_ds, num_buckets: int = 64):
    """Classified segments -> (url, table_label, context_from_text): for
    each Table Caption's mined label, the same document's body sentences
    that mention it (empty string when nothing does — the reference also
    emits the enriched column for tables without textual co-references).

    Shuffle: one coarse url-hash exchange; the per-url apply is a pandas
    group inside each bucket (per-group ~1 ms map_groups overhead is
    amortized by the bucketing helper)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    segs = segments_ds.select_columns(["url", "seg_id", "cls", "text"])
    return bucketed_group_apply(
        segs, keys=["url"], fn=_url_table_context, num_buckets=num_buckets
    )


def qa_table_enrichment(segments_ds, question: str, num_buckets: int = 64):
    """QA-over-table-context composition (the reference's
    ``use_qa_table_enrichment`` pass: extractive QA runs on each table's
    ``context_from_text`` and the answer enriches the table record,
    `ingest/ingest.py:87-91` + `context_enrichment.py:141-155`).

    Pipeline: ``table_context`` (per-caption label + co-referencing body
    sentences) -> actor-pool ``answer_questions`` with the context column
    as the QA passage -> (url, table_label, context_from_text, answer,
    answer_start, answer_end, qa_score); nulls when the context does not
    answer the question."""
    from cosmos_ray.stages.qa import answer_questions

    ctx = table_context(segments_ds, num_buckets=num_buckets)
    # QA drops its text column; re-attach the context for the enriched shape
    ctx = ctx.map_batches(
        lambda t: t.append_column("__passage", t.column("context_from_text")),
        batch_format="pyarrow",
    )
    return answer_questions(ctx, question, text_col="__passage")


# ------------------------------------------------------------ boilerplate

def _site_of(url: str) -> str:
    parts = url.split("/", 3)
    return parts[2] if len(parts) > 2 else url


def detect_boilerplate(segments_ds, min_frac: float = 0.6, min_pages: int = 5,
                       cap_rows: int = 2_000_000):
    """Site-level boilerplate detection — the web analog of the
    reference's watermark heuristic (M14, `connected_components.py:210-218`:
    a recurring overlay artifact is detected and masked out of every
    page). A block whose exact text appears on >= ``min_frac`` of a
    site's pages (sites with >= ``min_pages`` pages) is boilerplate
    (nav/footer/header furniture), returned as
    (site, text, n_pages, site_pages, frac).

    Shuffle shape: batch-local (site, text, url) dedup combiner, then an
    EXACT two-stage distinct — groupby (site, text, url) first, then a
    count per (site, text) — so a url whose identical blocks span batch
    boundaries is still counted once. Site page totals broadcast under
    ``cap_rows`` (site count is unbounded on a real crawl), else they
    join distributed."""
    import numpy as np

    import ray
    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "url": t.column("url").to_pylist(),
                "text": t.column("text").to_pylist(),
            }
        )
        df["site"] = [_site_of(u) for u in df["url"]]
        d = df.drop_duplicates(["site", "text", "url"])
        return pa.Table.from_pandas(d[["site", "text", "url"]], preserve_index=False)

    counts = (
        segments_ds.select_columns(["url", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["site", "text", "url"])
        .aggregate(Count(alias_name="__d"))
        .drop_columns(["__d"])
        .groupby(["site", "text"])
        .aggregate(Count(alias_name="n_pages"))
    )

    def url_partial(t: pa.Table) -> pa.Table:
        urls = sorted(set(t.column("url").to_pylist()))
        return pa.table(
            {
                "site": pa.array([_site_of(u) for u in urls], pa.string()),
                "url": pa.array(urls, pa.string()),
            }
        )

    site_pages = (
        segments_ds.select_columns(["url"])
        .map_batches(url_partial, batch_format="pyarrow")
        .groupby(["site", "url"])
        .aggregate(Count(alias_name="_"))
        .groupby("site")
        .aggregate(Count(alias_name="site_pages"))
    )

    def finish_tbl(t: pa.Table) -> pa.Table:
        n = t.column("n_pages").to_numpy(zero_copy_only=False).astype(np.float64)
        sp = t.column("site_pages").to_numpy(zero_copy_only=False).astype(np.float64)
        frac = np.where(sp > 0, n / np.maximum(sp, 1.0), 0.0)
        keep = (sp >= min_pages) & (frac >= min_frac)
        # round half-away-from-zero (SQL round()) — np.round is half-even
        out = t.set_column(
            t.schema.get_field_index("site_pages"), "site_pages",
            pa.array(sp.astype(np.int64)),
        )
        out = out.append_column("frac", pa.array(np.floor(frac * 1e6 + 0.5) / 1e6))
        return out.filter(pa.array(keep))

    from cosmos_ray.queries.relational import collect_small

    totals_tbl = collect_small(site_pages, cap_rows)
    if totals_tbl is not None and totals_tbl.num_rows:
        totals = dict(
            zip(totals_tbl.column("site").to_pylist(),
                totals_tbl.column("site_pages").to_pylist())
        )
        totals_ref = ray.put(totals)

        def finish(t: pa.Table) -> pa.Table:
            tot = ray.get(totals_ref)
            sp = pa.array(
                [tot.get(s, 0) for s in t.column("site").to_pylist()], pa.int64()
            )
            return finish_tbl(t.append_column("site_pages", sp))

        return counts.map_batches(finish, batch_format="pyarrow")

    # distributed fallback: per-site totals join the counts by site
    # (both are groupby outputs — scrub their zero-column empty blocks)
    from cosmos_ray.queries.relational import _join_partitions, drop_empty_blocks

    j = drop_empty_blocks(counts).join(
        drop_empty_blocks(site_pages), join_type="inner",
        num_partitions=_join_partitions(), on=("site",),
    )
    return j.map_batches(finish_tbl, batch_format="pyarrow")


def mask_boilerplate(segments_ds, boilerplate_ds, cap_rows: int = 2_000_000):
    """Drop boilerplate blocks from a segments dataset — broadcast the
    (site, text) boilerplate set (small: per-site furniture) and filter
    each batch (the masking half of the watermark heuristic)."""
    import ray

    from cosmos_ray.queries.relational import collect_small

    bp = collect_small(boilerplate_ds.select_columns(["site", "text"]), cap_rows)
    if bp is None:
        raise ValueError("boilerplate set exceeds broadcast cap — raise cap_rows")
    keys = set(zip(bp.column("site").to_pylist(), bp.column("text").to_pylist()))
    ref = ray.put(keys)

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        urls = t.column("url").to_pylist()
        texts = t.column("text").to_pylist()
        keep = [(_site_of(u), x) not in ks for u, x in zip(urls, texts)]
        return t.filter(pa.array(keep))

    return segments_ds.map_batches(fn, batch_format="pyarrow")
