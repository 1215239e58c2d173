"""Test configuration: CPU backend with 8 virtual devices, float64 numerics.

Tests validate physics against the reference oracles (float64 tolerances) and
sharding against a virtual multi-device mesh; the TPU path is exercised by
bench.py and __graft_entry__.py on real hardware.

Note: the session environment registers a TPU-tunnel PJRT plugin at
interpreter startup and force-selects it as the default platform, so the
platform must be overridden through jax.config (the JAX_PLATFORMS env var is
clobbered by that plugin's registration).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("DIFFLEXMM_TESTS_TPU", "0") != "1":
    # Default tier: CPU / f64 / 8 virtual devices. Set DIFFLEXMM_TESTS_TPU=1
    # to keep the real TPU backend (enables tests/test_tpu_parity.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

if os.environ.get("DIFFLEXMM_TESTS_NO_CACHE", "0") != "1":
    # The suite's wall-clock is dominated by XLA:CPU compiles of
    # grad-through-scan programs (this box exposes one core); a persistent
    # compilation cache makes re-runs of unchanged tests fast.
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
