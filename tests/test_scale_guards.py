"""Scale-discipline lint: every driver-side pull (`take_all()` /
dataset-level `to_pandas()`) in library code must be a consciously
allowlisted site (bounded by construction: model-sized tables, one row
per batch combiners, or collect_small-guarded). Adding a new pull makes
this test fail until the author justifies the site here — the review
gate the 100-TB design relies on.

Note: `pa.Table.to_pandas()` INSIDE a map_batches fn is a worker-local
conversion, not a driver pull; the allowlist below distinguishes sites
by file and expected count.
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "cosmos_ray"

# file (relative to cosmos_ray/) -> max allowed pull sites, each audited:
ALLOWED = {
    # worker-local Table.to_pandas inside bucketed group fns
    "stages/export.py": 1,
    "stages/canonicalize.py": 1,      # hash_pandas_object on a pa.Table slice
    "stages/aggregate.py": 4,         # per-bucket worker-local conversions
    "functions/sketch.py": 2,         # in-group quantile frame + checksum
                                      # one-row-per-batch partials
    # bounded driver reduces (model-sized / one row per batch):
    "stages/extract.py": 1,           # capped dup plan (5M guard + fallback)
    "state/manifest.py": 1,           # _tie_winners: one row per TIED url —
                                      # a rare metadata edge bounded by the
                                      # dup-plan cap; persisted for resume
    "state/compact.py": 1,            # one row per compaction group
    "functions/classify.py": 1,       # (label, token) model table
    "functions/textops.py": 1,        # vocabulary df table
    "functions/dedup.py": 2,          # bucket-size histograms (counts only)
    "functions/pack.py": 1,           # one row per bucket prefix table
    "functions/bpe.py": 1,            # word-frequency model table
    "functions/embed.py": 2,          # vocab + co-occurrence partials
    "functions/lm.py": 1,             # bigram model table
    "functions/stats.py": 5,          # worker-local Table.to_pandas inside
                                      # grouped_corr/value_histogram partials
                                      # + markov_stationary's model-sized
                                      # transition-count table (states², tiny)
                                      # + logrank_test's two worker-local
                                      # conversions (batch partial combiner;
                                      # distinct-duration finish table)
                                      # — ratchet equals the audited count,
                                      # no slack for unaudited new pulls
    "functions/graph.py": 3,          # shared k-smallest pivot-seed pull
                                      # (_smallest_k_seeds, k rows) and the
                                      # closeness per-level counts (k rows
                                      # per hop)
                                      # rows by construction (topk.take_all)
                                      # + label_propagation's worker-local
                                      # Table.to_pandas inside the argmax
                                      # combiner (per-batch, not a pull)
    "state/copartition.py": 4,        # worker-local bucket reads inside
                                      # join_bucket (+ typed-empty fallback)
    "functions/similarity.py": 4,     # seeded centroid samples (capped n)
                                      # + pq_fit codebook sample (sample_n cap)
                                      # + kmeans replayable init: the k
                                      # vec_id<k seed rows (k rows, model-
                                      # sized by construction)
    "functions/selection.py": 1,      # arrow Array.to_pandas inside a
                                      # map_batches fn (worker-local)
    "functions/retrieval.py": 0,      # df via .sum() combiner only
    "functions/windows.py": 0,
    "functions/matview.py": 1,        # worker-local Table.to_pandas inside
                                      # the delta combiner (per-batch)
    "state/versioned.py": 3,          # commit_delete_keys / commit_compact
                                      # / commit_merge_upsert pull ONE ROW
                                      # PER AFFECTED FILE / PER GROUP —
                                      # commit-plane metadata, file-count
                                      # bounded by design (the log itself
                                      # is driver-side JSON)
    "pipelines/kb_release.py": 2,     # fused sink: take_all over the
                                      # one-row-per-batch checksum/count
                                      # partials (replaces the former
                                      # table_checksum to_pandas pulls)
    "state/graph_store.py": 1,        # khop frontier pull — node-bounded
                                      # and guarded by a raising
                                      # max_frontier cap (test-gated)
    "functions/temporal.py": 0,
    "functions/validate.py": 0,
    "functions/geometry.py": 0,
    # relational.py hosts collect_small itself (the guard) + topk merge
    "queries/relational.py": None,    # exempt: IS the guarded layer
    "queries/driver_queries.py": None,  # query layer: pulls documented inline
    "queries/oracle_gen.py": None,
}

PAT = re.compile(r"\.take_all\(\)|\.to_pandas\(\)")


def test_no_new_unguarded_driver_pulls():
    unexpected = {}
    for f in sorted(ROOT.rglob("*.py")):
        rel = str(f.relative_to(ROOT))
        n = len(PAT.findall(f.read_text()))
        cap = ALLOWED.get(rel, 0)
        if cap is None:
            continue
        if n > cap:
            unexpected[rel] = (n, cap)
    assert not unexpected, (
        f"new driver-pull sites need an audit + allowlist bump: {unexpected}")
