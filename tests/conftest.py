"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware.

NB: in this image a sitecustomize imports jax at interpreter startup (axon
TPU backend), so env-var-only overrides are too late — jax.config.update is
what actually flips the platform before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def random_dna(rng, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture
def make_dna(rng):
    def _make(n):
        return random_dna(rng, n)
    return _make


def mutate(rng, seq: str, n_sub=0, n_ins=0, n_del=0) -> str:
    """Apply exactly the given numbers of random subs/inserts/deletes."""
    s = list(seq)
    for _ in range(n_sub):
        i = int(rng.integers(0, len(s)))
        choices = [c for c in "ACGT" if c != s[i]]
        s[i] = choices[int(rng.integers(0, 3))]
    for _ in range(n_ins):
        i = int(rng.integers(0, len(s) + 1))
        s.insert(i, "ACGT"[int(rng.integers(0, 4))])
    for _ in range(n_del):
        i = int(rng.integers(0, len(s)))
        del s[i]
    return "".join(s)


@pytest.fixture
def make_mutant(rng):
    def _make(seq, n_sub=0, n_ins=0, n_del=0):
        return mutate(rng, seq, n_sub, n_ins, n_del)
    return _make


# files whose tests are long-running (e2e assemblies, reference-subprocess
# parity, 8-device pipeline identity): auto-mark as `slow` so
# `pytest -m "not slow"` stays a sub-minute signal
_SLOW_FILES = ("test_e2e_cenx", "test_mono_e2e", "test_reference_parity",
               "test_parallel")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in str(item.fspath) for s in _SLOW_FILES):
            item.add_marker(pytest.mark.slow)
