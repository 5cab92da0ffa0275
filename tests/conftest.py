"""Test harness: run everything on a virtual 8-device CPU mesh.

Tests never require TPU hardware; sharding tests see 8 XLA host devices
(mirrors the driver's multi-chip dry-run environment).

If the interpreter was booted with the axon TPU sitecustomize hook (which
routes every XLA compile — even CPU ones — through a remote tunnel at
~1.6s/compile), re-exec pytest once with a sanitized environment so the
suite compiles locally. The re-exec happens in pytest_configure, after
global output capture is released, so the child's output reaches the caller.
"""

import os
import sys

_NEEDS_SANITIZE = (
    ".axon_site" in os.environ.get("PYTHONPATH", "")
    or os.environ.get("JAX_PLATFORMS", "cpu") != "cpu"
) and not os.environ.get("SCORP_TESTS_REEXECED")


def pytest_configure(config):
    if not _NEEDS_SANITIZE:
        return
    env = dict(os.environ)
    env["SCORP_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if p and ".axon_site" not in p
    )
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


if not _NEEDS_SANITIZE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_enable_x64", False)
