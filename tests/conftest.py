"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against 8 virtual CPU devices.  NOTE: this image's sitecustomize imports jax
at interpreter startup with JAX_PLATFORMS=axon (a tunneled real TPU chip), so
setting env vars here is not enough — we must update jax.config directly
before any backend initializes.  Tiny test ops over the tunnel are ~1000x
slower than local CPU, so this also keeps the suite fast.
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; reconfigure)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
