"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

import ray

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def documents_small():
    return pq.read_table(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def pages_small(documents_small):
    from cosmos_ray.sources.pages import generate_pages_table

    return generate_pages_table(documents_small)


@pytest.fixture(scope="session")
def golden_small(documents_small):
    from cosmos_ray.sources.pages import golden_corpus

    return golden_corpus(documents_small)


@pytest.fixture(scope="session")
def kg_small(pages_small):
    """Build the full KG once for the session; many tests read from it."""
    import ray.data as rd

    from cosmos_ray.pipelines.kg import build_kg

    return build_kg(rd.from_arrow(pages_small))
