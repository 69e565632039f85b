"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on the CPU backend with
XLA-simulated devices (SURVEY.md §4 item e); the real TPU is only used
by bench.py.

Note: the 'axon' TPU plugin in this environment ignores the
JAX_PLATFORMS environment variable, so the platform must be forced via
jax.config before any computation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
