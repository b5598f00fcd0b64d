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
