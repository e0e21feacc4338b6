"""Test configuration: force JAX onto a virtual 8-device CPU mesh with x64.

Device kernels are validated on CPU (deterministic f64) against the NumPy
oracle; the same code paths run on TPU in production. Multi-chip sharding
tests use the 8 virtual devices.
"""

import os
import sys

# NOTE: the environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel);
# tests must run on local CPU or every dispatch crosses the network.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
if "xla_backend_optimization_level" not in os.environ["XLA_FLAGS"]:
    # LLVM -O0 for the CPU test backend (round-5 verdict #9): the df32
    # interpret kernels' COLD compiles drop ~12x (the engine-level
    # v1-vs-v2 exact parity test: 936 s -> 80 s) while FP semantics are
    # unchanged (no fast-math at any LLVM opt level — the bit-exact
    # golden/parity assertions pin this). Execution is slower at -O0,
    # but these are tiny-shape interpret runs; the dryrun gate has used
    # the same flag since round 3.
    os.environ["XLA_FLAGS"] += " --xla_backend_optimization_level=0"
os.environ["JAX_ENABLE_X64"] = "true"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # .axon_site overrides the env var
jax.config.update("jax_enable_x64", True)

# Interpret-mode Pallas kernels compile in O(10min) on CPU (the df32 pair
# kernel unrolls to a huge HLO graph); the persistent cache makes every
# suite run after a given tree state load them in seconds.
from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/jax_demux_tests"))
