"""Test configuration: run on an 8-virtual-device CPU mesh.

Multi-chip logic (shard_map + ppermute/psum) is validated on CPU exactly as
the driver's dryrun does; bench.py runs on the real TPU chip.
"""

import os

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
