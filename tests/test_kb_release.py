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
