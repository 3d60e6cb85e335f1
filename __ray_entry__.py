"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(nor in `cosmos_ray`) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship KG-construction pipeline on sf0.001 — synthesizes
  the Common-Crawl-style pages table (BASELINE.json input_hint shape)
  from the driver's documents table, runs extract → segment/classify →
  triples → link → canonicalize, returns the deduped triples Dataset.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 + training-data ops), each over ``sf_dir`` tables.
- ``oracle_sql()``: value-exact DuckDB equivalents for 275 of the 285
  queries (the whole kg_* family replays via `queries/oracle_gen.py`,
  including unrolled Brandes betweenness and unrolled replayable Lloyd
  k-means, the composed kb_release, the two-column layout geometry
  (`oracle_gen.layout_ctes`), the baseline + 4:2:0 JPEG flat-tile
  reconstruction, the full aHash/band-LSH image near-dup chain and the
  exact-substring dedup window/island replay); the 10 rows-only
  queries have SVD / seeded-approximate / iterative / binary-decode
  semantics SQL cannot replay and carry exact pytest goldens instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    import ray.data as rd

    from cosmos_ray.queries.driver_queries import q_kg_triples

    return q_kg_triples(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from cosmos_ray.queries.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cosmos_ray.queries.driver_queries import ORACLES

    return dict(ORACLES)
