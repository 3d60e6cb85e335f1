"""End-to-end KB release pipeline gates (`pipelines/kb_release.py`)."""

import json
import os

import pyarrow.parquet as pq

from cosmos_ray.pipelines.kb_release import release_facts, write_release

SF = "/root/testdata/sf0.001"


class TestKbRelease:
    def test_release_facts_validated_and_linked(self):
        df = release_facts(SF).to_pandas()
        assert len(df) > 0
        # every released fact is canonically linked at both endpoints
        assert (df.subj_id.str.startswith("E")).all()
        assert (df.obj_id.str.startswith("E")).all()
        # fused: one object per (subj, pred)
        assert not df.duplicated(subset=["subj", "pred"]).any()

    def test_write_release_atomic_and_deterministic(self, tmp_path):
        out = str(tmp_path / "release")
        m1 = write_release(SF, out)
        assert os.path.exists(os.path.join(out, "manifest.json"))
        with open(os.path.join(out, "manifest.json")) as f:
            on_disk = json.load(f)
        assert on_disk == m1
        facts = pq.read_table(os.path.join(out, "facts"))
        assert facts.num_rows == m1["facts_rows"]
        assert m1["entities_rows"] == 120
        # no tmp turds left behind (atomic publish)
        assert not [p for p in os.listdir(tmp_path)
                    if p.startswith("release.tmp-")]
        # a rebuild publishes byte-equivalent content (checksum equality
        # without re-reading the release)
        out2 = str(tmp_path / "release2")
        m2 = write_release(SF, out2)
        assert m2["facts_checksum"] == m1["facts_checksum"]
        assert m2["entities_checksum"] == m1["entities_checksum"]
        assert m2["facts_rows"] == m1["facts_rows"]


class TestVersionedRelease:
    def test_publish_time_travel_and_diff(self, tmp_path):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.pipelines.kb_release import publish_release_versioned
        from cosmos_ray.state.versioned import (commit_overwrite,
                                                read_snapshot, version_diff)

        store = str(tmp_path / "kb_store")
        rec = publish_release_versioned(SF, store)
        assert rec["version"] == 1
        v1 = read_snapshot(store).to_pandas()
        assert len(v1) > 0 and "fact_id" in v1.columns
        assert not v1.duplicated(subset=["fact_id"]).any()

        # a second (simulated) release: one fact dropped, one re-scored
        v2df = v1.iloc[1:].copy()
        v2df.loc[v2df.index[0], "n_mentions"] = \
            int(v2df.iloc[0]["n_mentions"]) + 100
        commit_overwrite(store, rd.from_arrow(
            pa.Table.from_pandas(v2df, preserve_index=False)),
            op="kb_release")

        # time travel: release 1 is intact under release 2
        assert len(read_snapshot(store, 1).to_pandas()) == len(v1)
        diff = version_diff(store, "fact_id", 1, 2).to_pandas()
        changes = dict(zip(diff["fact_id"], diff["change"]))
        assert list(changes.values()).count("delete") == 1
        assert changes[v1.iloc[0]["fact_id"]] == "delete"
        assert changes[v2df.iloc[0]["fact_id"]] == "update"


class TestRepublish:
    def test_write_release_republish_same_dir(self, tmp_path):
        """Re-publishing onto an existing release swaps it atomically
        (os.replace onto a non-empty dir would raise) and leaves no
        tmp/old turds behind."""
        out = str(tmp_path / "release")
        m1 = write_release(SF, out)
        m2 = write_release(SF, out)  # republish onto the same path
        assert m2 == m1
        with open(os.path.join(out, "manifest.json")) as f:
            assert json.load(f) == m2
        leftovers = [p for p in os.listdir(tmp_path)
                     if p.startswith("release.tmp-")
                     or p.startswith("release.old-")]
        assert leftovers == []


class TestEmptyReleaseValidation:
    def test_release_validation_empty_release(self, monkeypatch):
        """An empty (but valid) release reports zero violations per
        rule instead of raising on int(None) aggregates."""
        import pyarrow as pa

        import ray.data as rd

        import cosmos_ray.pipelines.kb_release as kbr
        from cosmos_ray.queries.driver_queries import q_release_validation

        empty = pa.table({
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string()),
            "subj_id": pa.array([], pa.string()),
            "obj_id": pa.array([], pa.string()),
            "n_mentions": pa.array([], pa.int64()),
            "n_hosts": pa.array([], pa.int64()),
        })
        monkeypatch.setattr(kbr, "release_facts",
                            lambda sf: rd.from_arrow(empty))
        df = q_release_validation(SF).to_pandas()
        assert len(df) == 5
        assert (df["violations"] == 0).all()
