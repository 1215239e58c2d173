"""Importing the package must not initialize a JAX backend.

Platform pinning (jax.config.update("jax_platforms", "cpu")) only works
BEFORE the first backend query; a module-level jnp constant or jnp default
argument anywhere in the package would silently commit the
sitecustomize-forced platform at import time and break every CPU-pinning
workflow (tests, f64 verification subprocesses, plotting CLI)."""

import subprocess
import sys
from pathlib import Path


def test_package_imports_do_not_initialize_backend():
    repo = Path(__file__).resolve().parents[1]
    script = """
import sys; sys.path.insert(0, {repo!r})
import difflexmm_tpu
import difflexmm_tpu.geometry
import difflexmm_tpu.ops
import difflexmm_tpu.solver
import difflexmm_tpu.models
import difflexmm_tpu.parallel
import difflexmm_tpu.objectives
import difflexmm_tpu.fabrication
import difflexmm_tpu.tracking
import difflexmm_tpu.serving
import difflexmm_tpu.run
from jax._src import xla_bridge
assert not xla_bridge._backends, "backend initialized at import time"
import jax
jax.config.update("jax_platforms", "cpu")  # must still be possible
assert jax.default_backend() == "cpu"
print("IMPORTS_CLEAN")
""".format(repo=str(repo))
    result = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert "IMPORTS_CLEAN" in result.stdout, (result.stdout, result.stderr[-2000:])
