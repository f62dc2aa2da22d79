"""Bit-level parity vs the reference's kaolin/diffusers numerics, driven by
the fixture bank produced by scripts/make_reference_fixtures.py in the
reference's CUDA environment (PARITY.md "requires reference fixtures").

Every test skips when its fixture file is absent, so the suite is green in
the zero-egress TPU env and becomes a hard gate the moment the bank is
dropped in (env TPUNERF_FIXTURES or tests/fixtures/reference/)."""
import os
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

_DIR = Path(os.environ.get(
    "TPUNERF_FIXTURES",
    Path(__file__).parent / "fixtures" / "reference"))


def _load(name):
    f = _DIR / name
    if not f.exists():
        pytest.skip(f"fixture bank not present: {f}")
    return np.load(f, allow_pickle=False)


def test_camera_transform_matches_kaolin():
    fx = _load("camera.npz")
    from tpunerf.core import camera as cam

    mine = np.asarray(cam.camera_transform_from_view(
        fx["thetas"], fx["phis"], fx["radii"]))
    np.testing.assert_allclose(mine, fx["transforms"], atol=1e-5, rtol=1e-5)
    proj = np.asarray(cam.perspective_projection())
    np.testing.assert_allclose(proj, fx["projection"], atol=1e-6)


def test_rasterize_matches_kaolin():
    fx = _load("rasterize.npz")
    from tpunerf.core import camera as cam
    from tpunerf.kernels import rasterize as rast

    verts = jnp.asarray(fx["verts"])
    faces = jnp.asarray(fx["faces"])
    transform = cam.camera_transform_from_view(
        float(fx["theta"]), float(fx["phi"]), float(fx["radius"]))
    fv_cam, fv_img, _ = cam.prepare_vertices(
        verts, faces, cam.perspective_projection(), transform)
    np.testing.assert_allclose(np.asarray(fv_cam)[0], fx["fv_cam"],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fv_img)[0], fx["fv_img"],
                               atol=1e-5, rtol=1e-5)

    uv_face = jnp.asarray(fx["uvs"])[faces][None]
    feats, face_idx = rast.rasterize(int(fx["height"]), int(fx["width"]),
                                     fv_cam[..., 2], fv_img, uv_face)
    fi_mine = np.asarray(face_idx)[0]
    fi_ref = fx["face_idx"]
    # background/foreground classification must agree everywhere; the winning
    # face may differ on a handful of edge/z-fighting pixels
    assert ((fi_mine >= 0) == (fi_ref >= 0)).mean() > 0.995
    same = (fi_mine == fi_ref) & (fi_ref >= 0)
    assert same.mean() > 0.95
    np.testing.assert_allclose(np.asarray(feats)[0][same],
                               fx["uv_map"][same], atol=1e-4, rtol=1e-4)


def test_texture_mapping_matches_kaolin():
    fx = _load("texture_mapping.npz")
    from tpunerf.kernels.texture import texture_mapping

    tex = jnp.asarray(fx["texture"]).transpose(0, 2, 3, 1)   # NCHW → NHWC
    for mode in ("nearest", "bilinear", "bicubic"):
        mine = np.asarray(texture_mapping(jnp.asarray(fx["uv"]), tex,
                                          mode=mode))
        ref = fx[mode]
        if ref.shape[1] == mine.shape[-1]:                    # NCHW ref
            ref = ref.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(mine, ref, atol=3e-5, rtol=1e-4,
                                   err_msg=mode)


def test_sh_lighting_matches_kaolin():
    fx = _load("sh_lighting.npz")
    from tpunerf.meshrep.render import spherical_harmonic_lighting

    mine = np.asarray(spherical_harmonic_lighting(
        jnp.asarray(fx["normals"]), jnp.asarray(fx["lights"])))
    np.testing.assert_allclose(mine, fx["lighting"].reshape(mine.shape),
                               atol=1e-5, rtol=1e-5)


def test_scheduler_tables_match_diffusers():
    fx = _load("scheduler.npz")
    from tpunerf.guidance.schedulers import NoiseSchedule

    ns = NoiseSchedule.scaled_linear()
    np.testing.assert_allclose(np.asarray(ns.alphas_cumprod),
                               fx["alphas_cumprod"], atol=1e-6, rtol=1e-6)


def test_sd_outputs_match_diffusers():
    """Needs both the fixture and converted SD weights (TPUNERF_SD_DIR)."""
    fx = _load("sd.npz")
    sd_dir = os.environ.get("TPUNERF_SD_DIR")
    if not sd_dir:
        pytest.skip("TPUNERF_SD_DIR not set (converted SD weights)")
    import jax

    from tpunerf.guidance.stable_diffusion import StableDiffusionGuidance

    sd = StableDiffusionGuidance.create(jax.random.key(0),
                                        model_dir=Path(sd_dir))
    emb = np.asarray(sd.encode_text_ids(jnp.asarray(fx["input_ids"])))
    np.testing.assert_allclose(emb, fx["text_embeddings"], atol=1e-3,
                               rtol=1e-3)
    eps = np.asarray(sd.unet_apply(
        jnp.asarray(fx["latents"]).transpose(0, 2, 3, 1),
        jnp.asarray(int(fx["t"])), jnp.asarray(fx["text_embeddings"])))
    np.testing.assert_allclose(eps, fx["eps"].transpose(0, 2, 3, 1),
                               atol=5e-3, rtol=5e-3)
    lat = np.asarray(sd.encode_imgs_mode(
        jnp.asarray(fx["image"]).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(lat, fx["vae_latent_mode"].transpose(0, 2, 3, 1),
                               atol=5e-3, rtol=5e-3)
