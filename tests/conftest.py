"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

# sandbox-VM THP workaround (see parquet2_ray/__init__.py): must be in
# the environment BEFORE numpy's first import and before ray.init so
# every Ray worker inherits it
import os as _os_env

_os_env.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
_os_env.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "jemalloc")
_os_env.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "131072")
_os_env.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "131072")

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tokens_table() -> pa.Table:
    """Small deterministic tokens table (FIXTURES.md F1 shape)."""
    from parquet2_ray.sources.tokens import make_tokens_table

    return make_tokens_table(num_rows=1000, seed=42)


def assert_arrays_equal(a: pa.Array, b: pa.Array) -> None:
    assert a.type == b.type, f"type mismatch: {a.type} vs {b.type}"
    assert len(a) == len(b)
    assert a.equals(b), "arrays differ"


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
