"""pytest plugin (loaded via ``addopts = -p vio360_pytest_guard``) that
re-execs the test run in a clean CPU-only environment.

This container pre-sets ``PALLAS_AXON_POOL_IPS`` and a sitecustomize
that registers the remote-TPU PJRT plugin (with remote compile) in
every python process at interpreter start; under it, CPU test runs get
serialized through the TPU relay. Because it acts at interpreter start,
the only reliable opt-out is to re-exec with the pool env removed.

This module is imported by pytest BEFORE its fd-level output capture is
installed (``-p`` plugins load at parse time), so exec here preserves
stdout/stderr. tests/conftest.py then sets the virtual 8-device CPU
platform in the child.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_VIO360_TEST_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_VIO360_TEST_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
