"""Test config: run the suite on CPU with 8 virtual devices so sharding
tests exercise real multi-device code paths without TPU hardware (the TPU
analogue of a fake backend; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual) CPU
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU-tunnel PJRT plugin at
# interpreter start and sets jax_platforms="axon,cpu", silently
# overriding the env var — every "CPU" test then runs over the tunnel
# (~100x slower, and a different codegen target than the one under
# test). Force the config back explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
