"""Early pytest plugin: re-exec the test process with a TPU-tunnel-free env.

The container's sitecustomize registers an 'axon' TPU-tunnel PJRT plugin in
every Python process when PALLAS_AXON_POOL_IPS is set; under that registration
CPU-only test runs route XLA compiles through the tunnel relay (slow, and it
can wedge entirely). Tests run on the CPU backend with 8 virtual devices
(SURVEY.md section 4 multi-chip strategy) and never need the tunnel.

Loaded via `addopts = "-p mpbp_tpu._pytest_plugin"` (pyproject.toml), which
imports this module before pytest's capture plugin replaces fd 1/2 — so the
re-exec'd process keeps the caller's stdout/stderr.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "_MPBP_TESTS_REEXECED"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["_MPBP_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]],
              env)
