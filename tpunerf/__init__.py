"""tpunerf — TPU-native latent-NeRF / latent-paint framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``chacorp/latent-nerf-test`` (see SURVEY.md): score-distillation (SDS) guided
3D generation with two interchangeable scene representations —

* a volumetric latent-NeRF field (hash-grid encoder + MLP, occupancy-grid
  pruned ray marching) emitting 4-channel Stable-Diffusion latents, and
* a textured mesh (differentiable rasterizer, latent UV texture).

Everything in the compute path is jit-compatible: static shapes, functional
transforms, PRNG-key threading, `jax.sharding.Mesh` distribution.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache (repo-local .jax_cache): the SD-v1 UNet
# alone is a multi-minute compile on the tunneled TPU backend; caching makes
# repeated CLI/bench/test invocations start in seconds. Opt out with
# TPUNERF_CACHE_DIR=0.
from tpunerf.utils.misc import enable_persistent_compilation_cache as _epcc

_epcc()
del _epcc
