"""Candidate entity linking against a dictionary index held in actor state.

Reference analog: the scispacy UMLS `EntityLinker` loaded once per worker
via a Dask plugin (`preload_plugins/linking_setup.py:9-16`) and applied
per paragraph with `score_threshold=0.8` (`entity_linking/link.py:11-43`);
surfaces above threshold become linked ids, the rest `ents_unlinked`
(`link.py:24-35`).

Ray-Data-first shape: the KB is broadcast ONCE via ``ray.put`` on the
driver; each ``EntityLinker`` actor fetches it in ``__init__`` (zero-copy
shared-memory read on the same node, one transfer per node on a cluster
— never re-shipped per batch) and builds its surface-form hash index
there. Linking itself is a vectorized dict lookup per batch.
"""

from __future__ import annotations

import pyarrow as pa

import ray

LINK_THRESHOLD = 0.8

LINKED_TRIPLES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
        ("subj_id", pa.string()),
        ("subj_score", pa.float32()),
        ("obj_id", pa.string()),
        ("obj_score", pa.float32()),
    ]
)


def broadcast_kb(kb_table: pa.Table) -> "ray.ObjectRef":
    """Put the KB table in the object store once (small-side broadcast,
    SURVEY.md §2.4 J4)."""
    return ray.put(kb_table)


class EntityLinker:
    """Actor-pool linker: ``map_batches(EntityLinker,
    fn_constructor_kwargs={"kb_ref": ref}, concurrency=N)``.

    Score semantics (mirrors `link.py:11` + surface_index): exact name
    1.0, alias 0.9, case-normalized name 0.85, miss 0.0; links require
    score > LINK_THRESHOLD.
    """

    def __init__(self, kb_ref=None, kb_table: pa.Table | None = None) -> None:
        if kb_table is None:
            kb_table = ray.get(kb_ref)
        self.index: dict[str, tuple[str, float]] = {}
        self.casefold_index: dict[str, tuple[str, float]] = {}
        for row in kb_table.to_pylist():
            cid = row["canonical_id"]
            self.index[row["name"]] = (cid, 1.0)
            self.casefold_index.setdefault(row["name"].casefold(), (cid, 0.85))
            for a in row["aliases"]:
                self.index.setdefault(a, (cid, 0.9))
                self.casefold_index.setdefault(a.casefold(), (cid, 0.85))

    def link_surface(self, surface: str) -> tuple[str, float]:
        hit = self.index.get(surface)
        if hit is None:
            hit = self.casefold_index.get(surface.casefold())
        if hit is None or hit[1] <= LINK_THRESHOLD:
            return ("", hit[1] if hit else 0.0)
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        # memoize within batch: few distinct surfaces, many rows
        cache: dict[str, tuple[str, float]] = {}

        def lk(s: str) -> tuple[str, float]:
            r = cache.get(s)
            if r is None:
                r = self.link_surface(s)
                cache[s] = r
            return r

        s_ids, s_sc, o_ids, o_sc = [], [], [], []
        for s in subs:
            cid, sc = lk(s)
            s_ids.append(cid)
            s_sc.append(sc)
        for o in objs:
            cid, sc = lk(o)
            o_ids.append(cid)
            o_sc.append(sc)
        out = batch.append_column("subj_id", pa.array(s_ids, pa.string()))
        out = out.append_column("subj_score", pa.array(s_sc, pa.float32()))
        out = out.append_column("obj_id", pa.array(o_ids, pa.string()))
        out = out.append_column("obj_score", pa.array(o_sc, pa.float32()))
        return out


# per-process linker cache for the task-fused variant (see
# segment.classify_batch for rationale); keyed by the broadcast ref so a
# fresh KB gets a fresh index
_LINKER_CACHE: dict = {}


def make_link_fn(kb_ref):
    def link_batch(batch: pa.Table) -> pa.Table:
        key = kb_ref.hex() if hasattr(kb_ref, "hex") else id(kb_ref)
        linker = _LINKER_CACHE.get(key)
        if linker is None:
            linker = EntityLinker(kb_ref=kb_ref)
            _LINKER_CACHE.clear()  # hold at most one KB index per worker
            _LINKER_CACHE[key] = linker
        return linker(batch)

    return link_batch


def link_triples(triples_raw, kb_ref, concurrency: int | tuple | None = (1, 4),
                 batch_size: int = 8192):
    """raw triples -> triples + (subj_id, obj_id) columns ("" = unlinked).

    ``concurrency=None`` selects the task-fused linker (plain function +
    per-process cached index); a value selects an actor pool (the shape
    for embedding-index linkers with heavy state)."""
    ds = triples_raw
    schema = ds.schema(fetch_if_missing=True)
    if schema is not None and "seg_id" in schema.names:
        ds = ds.drop_columns(["seg_id", "sent_id"])
    if concurrency is None:
        # batch_size=None: one batch per input block, so the fused task
        # chain never bundles blocks to satisfy a batch quota (bundling
        # collapses task parallelism)
        return ds.map_batches(make_link_fn(kb_ref), batch_format="pyarrow",
                              batch_size=None)
    return ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"kb_ref": kb_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
