import os

# Multi-chip tests run on a virtual 8-device CPU mesh (standard JAX mechanism;
# replaces the reference's "just run on 2 GPUs" check, see SURVEY.md §4).
#
# NOTE: this environment preimports jax at interpreter start (axon
# sitecustomize) with JAX_PLATFORMS=axon, so env vars alone are too late.
# Backends are initialized lazily, so switching the config here still works.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Auto-mark heavy tests `slow` (VERDICT r3 #10: keep the default gate fast).
# tests/slow_tests.txt lists nodeids measured >= 45 s single-core; the
# default `pytest -q -n 8` run deselects them (pytest.ini addopts) and
# finishes in ~5 min. Run everything with `pytest -m ""`.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_ids():
    try:
        with open(_SLOW_FILE) as f:
            return {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow = _slow_ids()
    if not slow:
        return
    for item in items:
        nodeid = item.nodeid.split("/")[-1]  # tests/foo.py::t -> foo.py::t
        if nodeid in slow:
            item.add_marker(pytest.mark.slow)
