"""At-rest adjacency store gates (`state/graph_store.py`)."""

import glob
import os

import pyarrow as pa

import ray.data as rd

from cosmos_ray.state.graph_store import (_bucket_paths, _buckets_of, khop,
                                          neighbors, write_adjacency_store)


def _adj(edges):
    return rd.from_arrow(pa.table({
        "src_entity": pa.array([e[0] for e in edges], pa.string()),
        "pred": pa.array(["rel"] * len(edges), pa.string()),
        "dst_entity": pa.array([e[1] for e in edges], pa.string()),
    }))


EDGES = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("e", "a"), ("x", "y")]


class TestGraphStore:
    def test_neighbors_exact_and_pruned(self, tmp_path):
        root = str(tmp_path / "adj")
        write_adjacency_store(_adj(EDGES), root, num_buckets=8)
        got = sorted(r["dst_entity"] for r in neighbors(root, "a").take_all())
        assert got == ["b", "c"]
        assert neighbors(root, "zz").count() == 0
        # partition pruning: one entity's lookup opens a strict subset
        # of the store's files
        all_files = glob.glob(os.path.join(root, "bucket=*", "*.parquet"))
        probed = _bucket_paths(root, _buckets_of(["a"], 8))
        assert 0 < len(probed) < len(all_files)

    def test_khop_bfs_levels(self, tmp_path):
        root = str(tmp_path / "adj")
        write_adjacency_store(_adj(EDGES), root, num_buckets=8)
        t = khop(root, ["a"], hops=2)
        levels = dict(zip(t.column("entity").to_pylist(),
                          t.column("hop").to_pylist()))
        # directed BFS: a -> {b, c} -> {d}; e is 3 hops out, x/y unreachable
        assert levels == {"a": 0, "b": 1, "c": 1, "d": 2}

    def test_khop_multi_seed_min_distance(self, tmp_path):
        root = str(tmp_path / "adj")
        write_adjacency_store(_adj(EDGES), root, num_buckets=4)
        t = khop(root, ["a", "d"], hops=1)
        levels = dict(zip(t.column("entity").to_pylist(),
                          t.column("hop").to_pylist()))
        assert levels == {"a": 0, "d": 0, "b": 1, "c": 1, "e": 1}

    def test_khop_unknown_seed(self, tmp_path):
        root = str(tmp_path / "adj")
        write_adjacency_store(_adj(EDGES), root, num_buckets=4)
        t = khop(root, ["nope"], hops=2)
        assert t.column("entity").to_pylist() == ["nope"]
        assert t.column("hop").to_pylist() == [0]

    def test_khop_frontier_guard(self, tmp_path):
        import pytest as _pytest

        root = str(tmp_path / "adj")
        write_adjacency_store(_adj(EDGES), root, num_buckets=4)
        with _pytest.raises(ValueError, match="max_frontier"):
            khop(root, ["a"], hops=2, max_frontier=1)


class TestManifestHash:
    def test_manifest_records_hash_id(self, tmp_path):
        from cosmos_ray.state.graph_store import HASH_ID
        import json

        root = str(tmp_path / "adj")
        m = write_adjacency_store(_adj(EDGES), root, num_buckets=4)
        assert m["hash"] == HASH_ID
        with open(os.path.join(root, "manifest.json")) as f:
            assert json.load(f)["hash"] == HASH_ID

    def test_reader_rejects_foreign_hash(self, tmp_path):
        """A store bucketed under a different hash must raise, not
        silently prune to the wrong buckets."""
        import json

        import pytest

        root = str(tmp_path / "adj")
        write_adjacency_store(_adj(EDGES), root, num_buckets=4)
        with open(os.path.join(root, "manifest.json")) as f:
            m = json.load(f)
        m["hash"] = "pandas-siphash"
        with open(os.path.join(root, "manifest.json"), "w") as f:
            json.dump(m, f)
        with pytest.raises(ValueError, match="bucketed with hash"):
            neighbors(root, "a")
        with pytest.raises(ValueError, match="bucketed with hash"):
            khop(root, ["a"], hops=1)
