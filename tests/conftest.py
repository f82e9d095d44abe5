"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual 8-device CPU mesh
(the TPU path is exercised by bench.py / the driver's dryrun on real
hardware).  Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax
import pytest

# the axon sitecustomize overrides JAX_PLATFORMS; force CPU via config
jax.config.update("jax_platforms", "cpu")

# persist compiled kernels across test runs (first run pays the compile)
_CACHE = pathlib.Path(__file__).parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CORPUS_DIR = pathlib.Path(__file__).parent / "corpus"


@pytest.fixture(scope="session")
def corpus_files():
    return sorted(CORPUS_DIR.iterdir())


@pytest.fixture(scope="session")
def small_corpus():
    """A few small/medium corpus files for fast roundtrip tests."""
    names = ["progc", "obj1", "paper1", "rfc5322.txt"]
    return [(n, (CORPUS_DIR / n).read_bytes()) for n in names]


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running multi-process tests")
