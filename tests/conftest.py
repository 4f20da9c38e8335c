"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere and golden parity runs in exact float32.

This image's sitecustomize imports jax and registers the TPU ("axon")
backend at interpreter startup, so setting JAX_PLATFORMS here would be too
late — jax is already initialized. Instead, if we detect a non-CPU backend
we re-exec pytest once with the corrected environment:

- in pytest_configure (not at module import) so we can first restore the
  real stdout/stderr fds from pytest's global capture — otherwise the
  child's output lands in the parent's capture temp file;
- with PALLAS_AXON_POOL_IPS removed so the child's sitecustomize skips TPU
  registration — the child inherits the parent's live tunnel sockets over
  execve, and a second registration attempt blocks on the unreleased chip.
"""
import os
import sys


def _needs_reexec() -> bool:
    if os.environ.get("DMDM_TEST_REEXEC") == "1":
        return False
    jax = sys.modules.get("jax")
    if jax is None:
        return os.environ.get("JAX_PLATFORMS") != "cpu"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return True


def pytest_configure(config):
    if _needs_reexec():
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env["DMDM_TEST_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        os.execve(
            sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
        )
    import jax

    # exact float32 matmuls for golden-parity comparisons
    jax.config.update("jax_default_matmul_precision", "highest")
