import os

# Tests run on a virtual 8-device CPU mesh; the real chip is only used by
# bench.py.  The environment's sitecustomize imports jax at interpreter
# startup with JAX_PLATFORMS=axon (real TPU), so setting env vars here is
# too late for the platform choice — but the backend itself is not yet
# initialized, so jax.config.update still wins.  XLA_FLAGS is read when
# the CPU client is created, which also hasn't happened yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
