"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere so pjit/mesh code paths are
exercised without TPU hardware (the standard JAX testing recipe).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scenedino_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.cache/jax_comp_cache_cpu")
