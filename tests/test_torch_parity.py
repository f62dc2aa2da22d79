"""Architecture-level numerical parity vs the reference's torch stack.

BASELINE.json's acceptance gate is reference-matching numerics. diffusers and
kaolin are not installable here (PARITY.md), but torch and transformers ARE —
so the CLIP text tower (reference stable_diffusion.py:80-82) and vision tower
(latent_paint_mesh/training/trainer.py:172-180, paint_by_example.py:705-751)
are verified end-to-end against the real HF torch modules: random-initialized
torch model → state dict → guidance/weights.py converter → flax module →
allclose on the same inputs. Layer-convention checks (Adam, GroupNorm,
nearest-upsample, diffusers' asymmetric downsample padding) cover the UNet/VAE
building blocks the same way.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------
# CLIP text encoder vs transformers.CLIPTextModel
# --------------------------------------------------------------------------

def test_clip_text_tower_matches_transformers():
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    from tpunerf.guidance.clip_text import CLIPTextConfig, CLIPTextModel
    from tpunerf.guidance.weights import convert_clip_text

    cfg = CLIPTextConfig.tiny()
    hf_cfg = HFTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_length, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = HFTextModel(hf_cfg).eval()

    ids = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, cfg.max_length))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    model = CLIPTextModel(cfg)
    params = convert_clip_text(_sd_numpy(hf), cfg)
    out = np.asarray(model.apply(params, jnp.asarray(ids)))

    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# CLIP vision tower vs transformers.CLIPVisionModelWithProjection
# --------------------------------------------------------------------------

def test_clip_vision_tower_matches_transformers():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection as HFVision

    from tpunerf.guidance.clip_vision import (CLIPImageEmbedder,
                                              CLIPVisionConfig)
    from tpunerf.guidance.weights import convert_clip_vision

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = HFVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        projection_dim=cfg.projection_dim, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = HFVision(hf_cfg).eval()

    px = np.random.default_rng(0).normal(
        0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).image_embeds.numpy()

    model = CLIPImageEmbedder(cfg)
    params = convert_clip_vision(_sd_numpy(hf), cfg)
    out = np.asarray(model.apply(params, jnp.asarray(px.transpose(0, 2, 3, 1))))

    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_clip_vision_pooled_matches_transformers():
    """pooler_output (post-LN class token) — the PbE exemplar-encoder input
    (paint_by_example.py:705-751)."""
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModel as HFVisionBare

    from tpunerf.guidance.clip_vision import CLIPVisionModel, CLIPVisionConfig
    from tpunerf.guidance.weights import convert_clip_vision

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = HFVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        projection_dim=cfg.projection_dim, hidden_act="quick_gelu")
    torch.manual_seed(1)
    hf = HFVisionBare(hf_cfg).eval()

    px = np.random.default_rng(1).normal(
        0, 1, (1, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).pooler_output.numpy()

    model = CLIPVisionModel(cfg)
    params = convert_clip_vision(_sd_numpy(hf), cfg)
    out = np.asarray(model.apply(
        {"params": params["params"]["vision"]},
        jnp.asarray(px.transpose(0, 2, 3, 1))))

    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# Optimizer: optax adam ≡ torch.optim.Adam (reference trainer.py:93-95)
# --------------------------------------------------------------------------

def test_adam_trajectory_matches_torch():
    import optax

    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (13,)).astype(np.float32)
    tgt = rng.normal(0, 1, (13,)).astype(np.float32)

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt_t = torch.optim.Adam([wt], lr=1e-2, betas=(0.9, 0.99), eps=1e-15)
    for _ in range(25):
        opt_t.zero_grad()
        ((wt - torch.from_numpy(tgt)) ** 2).sum().backward()
        opt_t.step()

    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    grad_fn = jax.grad(lambda w: jnp.sum((w - jnp.asarray(tgt)) ** 2))
    for _ in range(25):
        upd, state = tx.update(grad_fn(wj), state, wj)
        wj = optax.apply_updates(wj, upd)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               atol=1e-5, rtol=1e-5)


# --------------------------------------------------------------------------
# Layer conventions used across the UNet/VAE
# --------------------------------------------------------------------------

def test_groupnorm_matches_torch():
    from flax import linen as nn

    B, H, W, C, G = 2, 5, 7, 12, 4
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    scale = rng.normal(1, 0.2, (C,)).astype(np.float32)
    bias = rng.normal(0, 0.2, (C,)).astype(np.float32)

    gn_t = torch.nn.GroupNorm(G, C, eps=1e-5)
    with torch.no_grad():
        gn_t.weight.copy_(torch.from_numpy(scale))
        gn_t.bias.copy_(torch.from_numpy(bias))
        ref = gn_t(torch.from_numpy(x.transpose(0, 3, 1, 2))
                   ).numpy().transpose(0, 2, 3, 1)

    gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    out = np.asarray(gn.apply(
        {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}},
        jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_nearest_upsample_matches_torch():
    # diffusers Upsample2D = F.interpolate(scale_factor=2, mode='nearest')
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 5, 6, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
        mode="nearest").numpy().transpose(0, 2, 3, 1)
    out = np.asarray(jax.image.resize(jnp.asarray(x), (1, 10, 12, 3),
                                      method="nearest"))
    np.testing.assert_allclose(out, ref, atol=0, rtol=0)


def test_downsample_asymmetric_padding_matches_torch():
    """diffusers Downsample2D pads (0,1)×(0,1) then convs stride 2 with no
    padding (unet.py Downsample reproduces this)."""
    from tpunerf.guidance.unet import Downsample

    rng = np.random.default_rng(0)
    C = 4
    x = rng.normal(0, 1, (1, 8, 8, C)).astype(np.float32)

    torch.manual_seed(0)
    conv_t = torch.nn.Conv2d(C, C, 3, stride=2, padding=0)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
        ref = conv_t(xt).numpy().transpose(0, 2, 3, 1)

    params = {"params": {"conv": {
        "kernel": jnp.asarray(
            conv_t.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(conv_t.bias.detach().numpy())}}}
    out = np.asarray(Downsample(C).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
