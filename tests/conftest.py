"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so data/model-parallel sharding
paths (psum collectives, mesh partitioning) execute in CI without TPU
hardware (SURVEY.md §4).  The env vars must be set before jax is imported
anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms via jax.config, which wins over the env var — override it
# back to CPU so tests never compile over the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_modules():
    """Import the read-only reference repo as a torch oracle.

    Missing third-party deps of the reference (unidecode, inflect) are
    stubbed since only the model math is exercised, never the cleaners.
    Returns the reference's top-level module namespace dict, or skips if
    torch import fails.
    """
    import types

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")

    for name in ("unidecode", "inflect"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "unidecode":
                mod.unidecode = lambda s: s
            else:
                class _Engine:
                    def number_to_words(self, *a, **k):
                        return ""
                mod.engine = _Engine
            sys.modules[name] = mod

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import importlib
        ref = {}
        for name in ("transformer", "model.modules", "model.loss",
                     "model.fastspeech2_align", "utils.tools"):
            ref[name] = importlib.import_module(name)
        yield ref
    finally:
        if REFERENCE_ROOT in sys.path:
            sys.path.remove(REFERENCE_ROOT)
