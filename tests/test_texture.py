import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from tpunerf.kernels import texture as texk


def _torch_texture_mapping(uv, tex_nchw, mode):
    """kaolin texture_mapping semantics on torch: uv∈[0,1], v flipped,
    grid_sample(align_corners=False)."""
    grid = uv * 2.0 - 1.0
    grid = torch.stack([grid[..., 0], -grid[..., 1]], dim=-1)
    return TF.grid_sample(tex_nchw, grid, mode=mode, align_corners=False,
                          padding_mode="zeros")


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
def test_matches_torch_grid_sample(mode, rng):
    B, H, W, C = 2, 9, 13, 4
    tex = rng.standard_normal((B, H, W, C)).astype(np.float32)
    uv = rng.uniform(0.05, 0.95, size=(B, 6, 7, 2)).astype(np.float32)

    ours = texk.texture_mapping(jnp.asarray(uv), jnp.asarray(tex), mode=mode)

    tex_t = torch.from_numpy(tex).permute(0, 3, 1, 2)
    ref = _torch_texture_mapping(torch.from_numpy(uv), tex_t, mode)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_out_of_range_zero_padding(rng):
    tex = np.ones((1, 8, 8, 1), np.float32)
    uv = np.array([[[[-0.5, 0.5]], [[1.5, 0.5]]]], np.float32)  # outside
    out = texk.texture_mapping(jnp.asarray(uv), jnp.asarray(tex),
                               mode="bilinear")
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_bilinear_exact_at_texel_centers():
    H = W = 4
    tex = np.arange(H * W, dtype=np.float32).reshape(1, H, W, 1)
    # uv of texel center (i, j): x=(j+.5)/W, y=1−(i+.5)/H
    i, j = 2, 1
    uv = np.array([[[[(j + 0.5) / W, 1 - (i + 0.5) / H]]]], np.float32)
    out = texk.texture_mapping(jnp.asarray(uv), jnp.asarray(tex),
                               mode="bilinear")
    assert np.asarray(out).squeeze() == pytest.approx(tex[0, i, j, 0])


def test_resize_bicubic_shape():
    x = jnp.ones((1, 64, 64, 4))
    y = texk.resize_bicubic(x, 32, 32)
    assert y.shape == (1, 32, 32, 4)


def test_resize_bicubic_matches_torch(rng):
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    ours = texk.resize_bicubic(jnp.asarray(x), 64, 64)
    ref = TF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(64, 64), mode="bicubic",
                         align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_resize_bicubic_downscale_matches_torch(rng):
    x = rng.standard_normal((1, 64, 64, 4)).astype(np.float32)
    ours = texk.resize_bicubic(jnp.asarray(x), 24, 24)
    ref = TF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(24, 24), mode="bicubic", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)
