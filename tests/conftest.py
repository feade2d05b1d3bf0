"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware by presenting 8 CPU
devices (SURVEY.md §4 "Multi-host without a cluster").

NOTE: this image's ``sitecustomize.py`` imports jax at interpreter startup
with ``JAX_PLATFORMS=axon`` (the TPU tunnel), so env vars set here are too
late — the platform must be overridden through ``jax.config`` instead,
which works any time before first backend use.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, os.path.dirname(__file__))          # for `oracles`
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
