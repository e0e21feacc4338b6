"""Test configuration: force JAX onto a virtual 8-device CPU mesh with x64.

Device kernels are validated on CPU (deterministic f64) against the NumPy
oracle; the same code paths run on TPU in production. Multi-chip sharding
tests use the 8 virtual devices.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
