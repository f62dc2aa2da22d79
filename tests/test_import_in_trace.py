"""Regression tests for module-level jnp constants becoming leaked tracers.

Round-3 driver failure: `bench.py mesh_metrics` imported
`tpunerf.kernels.rasterize` for the first time *inside* an active
`lax.scan` trace (via the then-lazy `pixel_grid_ndc` import in
fields/volume_render.py), so the module-level `_SEL_FILLER = jnp.array(...)`
was created as a DynamicJaxprTracer.  Any later trace that touched
`_face_tables` then died with UnexpectedTracerError.  The CPU suite never
saw it because pytest imports modules at collection time, outside any trace.

Fix: module-level array constants are plain `np.array`.  These tests
(a) reproduce the driver scenario in a clean subprocess, and (b) pin the
invariant directly for every known module-level constant.
"""
import subprocess
import sys

import numpy as np

_DRIVER_REPRO = r"""
import jax
import jax.numpy as jnp

# First import of the module happens INSIDE a scan trace (as in bench.py's
# timing body) — any module-level jnp constant would be created as a tracer.
def body(c, _):
    import tpunerf.kernels.rasterize as rz
    return c + rz.pixel_grid_ndc(4, 4).sum(), None

out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=2)
out.block_until_ready()

# Now use the padded-face path (consumes _SEL_FILLER) in a NEW trace.
import tpunerf.kernels.rasterize as rz
fv = jnp.zeros((5, 3, 2), jnp.float32)
fz = jnp.zeros((5, 3), jnp.float32)
valid = jnp.ones((5,), bool)
tab = jax.jit(rz._face_tables)(fv, fz, valid)
tab.block_until_ready()

# And the guidance constants via the same pattern.
def body2(c, _):
    from tpunerf.guidance.stable_diffusion import latent_to_rgb_preview
    return c + latent_to_rgb_preview(jnp.ones((2, 4))).sum(), None

out2, _ = jax.lax.scan(body2, jnp.float32(0.0), None, length=2)
out2.block_until_ready()
from tpunerf.guidance.stable_diffusion import latent_to_rgb_preview
jax.jit(latent_to_rgb_preview)(jnp.ones((2, 4))).block_until_ready()
print("IMPORT_IN_TRACE_OK")
"""


def test_first_import_inside_scan_trace_then_reuse():
    """Reproduces the BENCH_r03 mesh_metrics crash in a fresh interpreter
    (fresh so the modules really are first-imported inside the trace)."""
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_REPRO],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "IMPORT_IN_TRACE_OK" in proc.stdout


def test_module_level_constants_are_numpy():
    """Every known module-level array constant must be np.ndarray (not a
    jax Array): np constants are trace-immune."""
    from tpunerf.guidance import clip_vision, stable_diffusion
    from tpunerf.kernels import rasterize

    for const in [
        rasterize._SEL_FILLER,
        stable_diffusion.LINEAR_RGB_ESTIMATOR,
        stable_diffusion.LATENT_GRAY,
        clip_vision.CLIP_IMAGE_MEAN,
        clip_vision.CLIP_IMAGE_STD,
    ]:
        assert type(const) is np.ndarray
