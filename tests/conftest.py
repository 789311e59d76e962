"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of exercising multi-rank topologies on one
box with `mpirun -n N` (SURVEY.md section 4.5): here multi-device sharding is
tested with XLA's host-platform device virtualization.
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel, which is single-chip and has slow cold compiles; unit tests always
# run on the virtual multi-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
