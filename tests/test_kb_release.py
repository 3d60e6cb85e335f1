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
