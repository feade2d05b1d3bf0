"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to present 8 devices (SURVEY.md §4 "Multi-host without a cluster").
Must run before the first jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))          # for `oracles`
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
