"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on the CPU backend with
XLA-simulated devices (SURVEY.md §4 item e); the real TPU is only used
by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
