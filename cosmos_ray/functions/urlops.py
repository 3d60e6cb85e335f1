"""URL canonicalization for crawl dedup — the normalize-before-dedup
step every Common-Crawl-scale pipeline runs ahead of keep-latest /
exact dedup (the engine's `events_latest` / `dedup_exact` analogs key
on raw urls; this produces the canonical key).

Spec (deliberately RE2- and DuckDB-replayable, verified value-for-value
by the driver oracle):
  1. lowercase the ``scheme://host[:port]`` prefix (path case is
     preserved — paths are case-sensitive on real servers),
  2. strip the ``#fragment``,
  3. strip default ports (``:443`` for https, ``:80`` for http),
  4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
     ``ref``), keeping all others in order,
  5. strip trailing slashes from the path,
  6. drop the ``?`` when the query ends up empty.

Scale shape: stateless vectorized ``map_batches`` — one regex extract
splits the url into (prefix, path, query); param filtering rebuilds the
arrow ListArray from offsets (no per-row Python); ``pc.binary_join``
reassembles. No shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|ref)="


def _filter_params(query: pa.Array) -> pa.Array:
    """Drop tracking params from '&'-separated query strings; fully
    vectorized (flatten -> mask -> rebuild list offsets -> join)."""
    qs = pc.fill_null(query, "")
    parts = pc.split_pattern(qs, "&")
    flat = pc.list_flatten(parts)
    lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.and_(
        pc.invert(pc.match_substring_regex(flat, TRACKING_PARAM_RE)),
        pc.not_equal(flat, ""),
    )
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    row_idx = np.repeat(np.arange(len(lens)), lens)
    kept_per_row = np.bincount(row_idx[keep_np], minlength=len(lens))
    offsets = np.zeros(len(lens) + 1, np.int32)
    np.cumsum(kept_per_row, out=offsets[1:])
    kept_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat.filter(keep)
    )
    return pc.binary_join(kept_list, "&")


def canonicalize_url_column(urls) -> pa.Array:
    """Vectorized canonical form of a string url column (see module
    docstring for the spec). Unparseable urls pass through unchanged."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    struct = pc.extract_regex(
        urls,
        r"^(?P<pre>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<path>[^?#]*)"
        r"(?:\?(?P<query>[^#]*))?(?:#.*)?$",
    )
    ok = pc.is_valid(struct)
    pre = pc.utf8_lower(pc.struct_field(struct, "pre"))
    pre = pc.replace_substring_regex(pre, r"^(https://[^:/]+):443$", r"\1")
    pre = pc.replace_substring_regex(pre, r"^(http://[^:/]+):80$", r"\1")
    path = pc.replace_substring_regex(pc.struct_field(struct, "path"), r"/+$", "")
    query = _filter_params(pc.struct_field(struct, "query"))
    qmark = pc.if_else(pc.equal(query, ""), "", "?")
    canon = pc.binary_join_element_wise(pre, path, qmark, query, "")
    return pc.if_else(ok, canon, urls)


def canonical_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Append ``out_col`` with the canonical form of ``url_col``."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, canonicalize_url_column(t.column(url_col)))

    return ds.map_batches(fn, batch_format="pyarrow")
