"""Early pytest plugin: re-exec the test run in a clean CPU-only environment.

Loaded via ``-p modt_test_bootstrap`` (pyproject addopts) so its import-time
code runs *before* pytest enables fd capture — an execve here keeps the real
stdout/stderr, whereas one from conftest.py would write into an orphaned
capture tempfile.

Why re-exec at all: the ambient environment injects a TPU-plugin
registration hook via sitecustomize (PYTHONPATH=/root/.axon_site) whose
network round-trips randomly stall even CPU-only python processes for
minutes, and JAX_PLATFORMS is pinned to the real TPU. Unit tests must run
on a virtual 8-device CPU mesh (SURVEY.md §4) with deterministic startup.
"""

import os
import sys

if os.environ.get("MODT_TESTS_REEXECED") != "1":
    env = dict(os.environ)
    env["MODT_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize hook for CPU tests
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
