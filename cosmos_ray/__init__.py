"""cosmos_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of UW-COSMOS/Cosmos
(document → typed segments → text → triples → linked entities → canonical
graph) over Common-Crawl-style web pages, expressed Ray-Data-first:
``ray.data.Dataset`` pipelines of zero-copy Arrow ``map_batches`` stages,
actor pools for stateful stages, explicit groupby/shuffle steps for the
wide operations, and per-partition checkpointed lineage for resumability.

Nothing here calls ``ray.init()``: sessions are owned by the caller
(driver / bench.py / pytest fixture).
"""

__version__ = "0.1.0"
