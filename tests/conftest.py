"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
``xla_force_host_platform_device_count=8`` per the multi-host test strategy
(SURVEY.md §4d).  Must be set before JAX initializes.
"""
import os

# Force-override: the environment pins JAX_PLATFORMS=axon (single real TPU);
# the test suite must run on the virtual CPU mesh regardless.  (The axon
# sitecustomize hook may still have claimed the chip at interpreter start —
# run pytest with PALLAS_AXON_POOL_IPS= to skip that ~3 min boot cost.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
