"""Schema-evolution parquet reads: one logical dataset over shards
written by DIFFERENT crawl/pipeline generations (missing columns, new
columns, widened integer/float types). At 100 TB a corpus is never
rewritten to adopt a schema change, so the read layer must absorb it:
this is Ray Data's analog of DuckDB/Spark ``union_by_name`` +
``mergeSchema``.

Shape: footer schemas are read per file (a metadata-only driver pass,
same discipline as `state/sorted_store.py` zone maps), files are
grouped by their exact physical schema, each group gets ONE distributed
``read_parquet`` whose batches are normalized to the unified schema by
a zero-copy-friendly arrow ``map_batches`` (casts + typed-null fill),
and the groups union — no data ever funnels through the driver.

Reference analog: the reference re-reads its own output parquets across
versions in `context_enrichment.py` (re-ingestion of aggregate parquet
files whose columns accrete across releases)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa


_INT_RANK = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_RANK = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_FLOAT_RANK = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Least common supertype of two physical column types, or raise.

    Lattice: null promotes to anything; signed ints widen among
    themselves (unsigned likewise; signed x unsigned -> int64); any
    int x float -> float64; floats widen among themselves; string ==
    large_string -> string; timestamps unify to microseconds; equal
    types pass through. Anything else is a real schema CONFLICT and
    raises — silent coercion of e.g. string vs int hides upstream bugs."""
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if a in _INT_RANK and b in _INT_RANK:
        return a if _INT_RANK[a] >= _INT_RANK[b] else b
    if a in _UINT_RANK and b in _UINT_RANK:
        return a if _UINT_RANK[a] >= _UINT_RANK[b] else b
    int_like = lambda t: t in _INT_RANK or t in _UINT_RANK  # noqa: E731
    if int_like(a) and int_like(b):
        return pa.int64()
    if a in _FLOAT_RANK and b in _FLOAT_RANK:
        return a if _FLOAT_RANK[a] >= _FLOAT_RANK[b] else b
    if (a in _FLOAT_RANK and int_like(b)) or (b in _FLOAT_RANK and int_like(a)):
        return pa.float64()
    stringish = lambda t: pa.types.is_string(t) or pa.types.is_large_string(t)  # noqa: E731
    if stringish(a) and stringish(b):
        return pa.string()
    binaryish = lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t)  # noqa: E731
    if binaryish(a) and binaryish(b):
        return pa.binary()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        if a.tz != b.tz:
            # naive wall-clock vs UTC (or two zones) is a real conflict:
            # unifying silently would mix time bases row-by-row
            raise ValueError(f"incompatible schema evolution: {a} vs {b} "
                             "(timezone mismatch)")
        return pa.timestamp("us", tz=a.tz)
    raise ValueError(f"incompatible schema evolution: {a} vs {b}")


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Union-by-name with type widening; column order = first
    appearance across the generations (stable, oldest first)."""
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = _widen(types[f.name], f.type)
    return pa.schema([(n, types[n]) for n in order])


def _normalize_to(target: pa.Schema):
    def fn(t: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in t.column_names:
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(len(t), f.type))
        return pa.table(cols, schema=target)

    return fn


def _parquet_files(paths: list[str] | str) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                          recursive=True)))
        else:
            files.append(p)
    if not files:
        raise ValueError(f"no parquet files under {paths!r}")
    return files


def read_parquet_evolved(paths: list[str] | str,
                         target: pa.Schema | None = None):
    """Distributed read of generation-mixed parquet as ONE dataset with
    the unified (or given) schema. Files sharing a physical schema read
    together (so Ray's per-group reads stay homogeneous and prunable);
    each group is normalized per batch; groups union."""
    import pyarrow.parquet as pq
    import ray.data as rd

    files = _parquet_files(paths)
    groups: dict[bytes, tuple[pa.Schema, list[str]]] = {}
    for f in files:
        sch = pq.read_schema(f)
        key = sch.remove_metadata().serialize().to_pybytes()
        groups.setdefault(key, (sch, []))[1].append(f)
    if target is None:
        target = unify_schemas([sch for sch, _ in groups.values()])
    norm = _normalize_to(target)
    out = None
    for sch, grp in groups.values():
        ds = rd.read_parquet(grp)
        if not sch.remove_metadata().equals(target.remove_metadata()):
            ds = ds.map_batches(norm, batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out
