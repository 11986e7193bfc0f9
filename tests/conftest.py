"""Test configuration: run all tests on a virtual 8-device CPU platform.

SURVEY.md §4: multi-chip sharding is tested on a virtual CPU mesh;
real-TPU paths are exercised by bench.py / the driver instead.

The heavy lifting (escaping this container's remote-TPU sitecustomize,
which would otherwise serialize CPU test runs through the TPU relay)
happens in ``vio360_pytest_guard`` loaded via pytest.ini addopts; it
re-execs pytest with a clean env before output capture starts. The env
below is a fallback for direct invocations that bypass pytest.ini.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
