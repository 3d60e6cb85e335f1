"""End-to-end KB RELEASE: crawl pages -> the validated canonical fact
table a downstream consumer actually reads, plus a published at-rest
release directory.

This composes the operators the query layer verifies piecewise into the
single production build (the web analog of running the reference's full
ingest then publishing its parquet outputs,
`htcosmos/make_parquet.py` + `ingest/ingest.py`):

  extract -> link -> fuse (host-vote winner per (subj, pred),
  `q_kg_fused_facts`) -> canonical endpoint linking -> ontology
  domain/range validation (`q_kg_type_violations` anti-join) ->
  released facts + entities + manifest.

The released fact table is oracle-checked END TO END (kb_release ★ —
one DuckDB query replays the whole composition), the strongest
correctness statement in the repo: not just each stage, but their
composition, is value-exact.

Scale shape: every stage reuses the audited primitives — evidence
rollups are (fact, host)-bounded groupbys, endpoint linking is a
vectorized vocabulary lookup, validation is a `semi_join_ds` anti-join
(broadcast key set under the cap, bloom + distributed join past it),
and the writer publishes partitioned parquet atomically (tmp ->
rename) with a manifest carrying counts + an order-insensitive
checksum (`sketch.table_checksum`) so a re-run can verify equality
without re-reading the release.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.compute as pc


def release_facts(sf_dir: str):
    """The released fact table: fused facts whose endpoints both link
    to canonical ids and whose canonical (pred, subj, obj) survives
    domain/range validation. Columns: (subj, pred, obj, subj_id,
    obj_id, n_mentions, n_hosts)."""
    from cosmos_ray.queries.driver_queries import (q_kg_fused_facts,
                                                   q_kg_type_violations)
    from cosmos_ray.queries.relational import semi_join_ds
    from cosmos_ray.sources.entity_dict import build_entity_dict, surface_index

    sidx = surface_index(build_entity_dict())
    surfaces = pa.array(list(sidx.keys()), pa.string())
    ids = pa.array([cid for cid, _sc in sidx.values()], pa.string())

    def link(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        si = pc.index_in(t.column("subj").combine_chunks(), surfaces)
        oi = pc.index_in(t.column("obj").combine_chunks(), surfaces)
        ok = pc.and_(pc.is_valid(si), pc.is_valid(oi))
        t = t.filter(ok)
        t = t.append_column("subj_id", pc.take(ids, si.filter(ok)))
        t = t.append_column("obj_id", pc.take(ids, oi.filter(ok)))
        return t.append_column("k", pc.binary_join_element_wise(
            t.column("pred").combine_chunks(),
            t.column("subj_id").combine_chunks(),
            t.column("obj_id").combine_chunks(), "|"))

    keyed = q_kg_fused_facts(sf_dir).map_batches(link,
                                                 batch_format="pyarrow")

    def vkey(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table({"k": pc.binary_join_element_wise(
            t.column("pred").combine_chunks(),
            t.column("src_entity").combine_chunks(),
            t.column("dst_entity").combine_chunks(), "|")})

    vkeys = q_kg_type_violations(sf_dir).map_batches(
        vkey, batch_format="pyarrow")
    out = semi_join_ds(keyed, vkeys, key_col="k", big_key="k", keep=False)
    return out.drop_columns(["k"])


def publish_release_versioned(sf_dir: str, table_dir: str) -> dict:
    """Publish the released fact table into the Delta-style VERSIONED
    store (`state/versioned.py`) as one overwrite commit — release
    management at rest: every publish is an immutable KB version, so
    consumers time-travel between releases (`read_snapshot(v)`), roll
    back a bad one (`rollback`), and diff two releases by fact key
    (`version_diff`). Each fact carries a stable ``fact_id``
    (subj|pred|obj) for the diff's key column. Returns the commit
    record."""
    from cosmos_ray.state.versioned import commit_overwrite

    def keyed(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return t.append_column("fact_id", pc.binary_join_element_wise(
            t.column("subj").combine_chunks(),
            t.column("pred").combine_chunks(),
            t.column("obj").combine_chunks(), "\x1f"))

    facts = release_facts(sf_dir).map_batches(keyed,
                                              batch_format="pyarrow")
    return commit_overwrite(table_dir, facts, op="kb_release")


def _sink_with_checksum(ds, part_dir: str, checksum_cols: list[str]) -> dict:
    """ONE streaming execution per table: each batch is written as a
    content-keyed atomic parquet shard (tmp + rename — identical bytes
    on lineage re-execution, the `extract_streaming` dead-letter
    pattern) AND contributes an XOR checksum/count partial; only the
    one-row-per-batch partials cross back to the driver. Replaces the
    former materialize + write_parquet + count + table_checksum chain
    (four dataset executions) with one."""
    import hashlib

    import pyarrow.parquet as pq

    from cosmos_ray.functions.sketch import checksum_partial

    os.makedirs(part_dir, exist_ok=True)

    def write_and_sum(t: pa.Table) -> pa.Table:
        x = checksum_partial(t, checksum_cols)
        if t.num_rows:
            # content key: checksum + rows + first-row digest — stable
            # across re-executions of the same block, collision-safe
            first = ":".join(
                str(t.column(c)[0].as_py()) for c in checksum_cols)
            key = hashlib.md5(
                f"{x:016x}|{t.num_rows}|{first}".encode()).hexdigest()[:16]
            final = os.path.join(part_dir, f"part_{key}.parquet")
            tmp = final + f".tmp{os.getpid()}"
            pq.write_table(t, tmp)
            os.replace(tmp, final)
        return pa.table({"x": pa.array([x], pa.uint64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(write_and_sum, batch_format="pyarrow").take_all()
    x = 0
    n = 0
    for r in parts:
        x ^= int(r["x"])
        n += int(r["n"])
    if n == 0:  # degenerate empty release: still publish a readable dir
        ds.write_parquet(part_dir)
    return {"rows": n, "checksum": format(x, "x")}


def write_release(sf_dir: str, out_dir: str) -> dict:
    """Publish a release directory: facts/ + entities/ partitioned
    parquet and a manifest.json with row counts and order-insensitive
    checksums. Atomic: written under a tmp dir, renamed into place —
    a reader never observes a partial release. Returns the manifest."""
    from cosmos_ray.queries.driver_queries import q_kg_entities

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    old = f"{out_dir}.old"
    # Single-publisher lock: the deterministic .old name + the rmtree
    # below assume ONE writer — a second concurrent publisher could
    # delete the first's just-parked rollback copy mid-swap. O_EXCL
    # sentinel with pid; a dead owner's stale lock is reclaimed.
    lock = f"{out_dir}.lock"
    os.makedirs(os.path.dirname(os.path.abspath(out_dir)), exist_ok=True)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
    except FileExistsError:
        try:
            with open(lock) as lf:
                owner = int(lf.read().strip() or "0")
            os.kill(owner, 0)  # raises if the owner is gone
            alive = True
        except (OSError, ValueError):
            alive = False
        if alive:
            raise RuntimeError(
                f"release publish already in progress (lock {lock})")
        try:
            os.replace(lock, lock + ".stale")  # reclaim atomically
            os.remove(lock + ".stale")
        except FileNotFoundError:
            pass  # a racing reclaimer already removed it
        return write_release(sf_dir, out_dir)
    # crash recovery from a prior republish: POSIX has no atomic
    # directory swap, so a writer killed between "move old aside" and
    # "move new in" leaves out_dir missing with the release parked at
    # the DETERMINISTIC .old name — restore it before publishing anew.
    if not os.path.isdir(out_dir) and os.path.isdir(old):
        os.replace(old, out_dir)
    shutil.rmtree(old, ignore_errors=True)  # stale leftover of a success
    try:
        os.makedirs(tmp, exist_ok=True)
        # one fused write+checksum+count execution per table (no
        # intermediate materialize; each table's batches stream straight
        # into content-keyed shards)
        f = _sink_with_checksum(release_facts(sf_dir),
                                os.path.join(tmp, "facts"),
                                ["subj", "pred", "obj"])
        e = _sink_with_checksum(q_kg_entities(sf_dir),
                                os.path.join(tmp, "entities"),
                                ["canonical_id", "name"])
        manifest = {
            "facts_rows": f["rows"],
            "entities_rows": e["rows"],
            "facts_checksum": f["checksum"],
            "entities_checksum": e["checksum"],
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        # Republish support: os.replace cannot swap onto a non-empty
        # directory, so move the previous release aside (deterministic
        # .old name), swap the new one in, then drop the old. A reader
        # sees either complete release EXCEPT in the microscopic window
        # between the two renames (no atomic dir swap on POSIX); a
        # crash there is self-healing — the recovery block above
        # restores .old on the next publish, or an operator renames
        # `<out_dir>.old` back by hand.
        have_old = False
        if os.path.isdir(out_dir):
            os.replace(out_dir, old)
            have_old = True
        try:
            os.replace(tmp, out_dir)
        except OSError:
            if have_old:
                os.replace(old, out_dir)  # restore the prior release
            raise
        if have_old:
            shutil.rmtree(old, ignore_errors=True)
        return manifest
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass
