"""Test configuration: force an 8-device virtual CPU platform.

This box pre-imports jax at interpreter startup (sitecustomize) with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late —
use jax.config.update, which works post-import as long as no backend has
been initialized yet.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from scenedino_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.cache/jax_comp_cache_cpu")
