"""Weight converter: a synthetic diffusers/torch-layout state dict for the
tiny configs must convert into exactly the flax parameter tree (names +
shapes validated by `_check_tree` against `jax.eval_shape` of init)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.guidance import weights
from tpunerf.guidance.clip_text import CLIPTextConfig, CLIPTextModel
from tpunerf.guidance.unet import UNet2DCondition, UNetConfig
from tpunerf.guidance.vae import AutoencoderKL, VAEConfig


def _conv_t(o, i, k=3):
    return np.random.default_rng(0).standard_normal((o, i, k, k)).astype(
        np.float32)


def _make_unet_sd(cfg: UNetConfig):
    """Enumerate diffusers UNet keys for our tiny config with torch shapes."""
    sd = {}
    rng = np.random.default_rng(0)

    def conv(key, o, i, k=3):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, k, k)).astype(
            np.float32)
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def dense(key, o, i, bias=True):
        sd[f"{key}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def norm(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def resnet(p, cin, cout, temb):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin)
        dense(f"{p}.time_emb_proj", cout, temb)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    def transformer(p, c, ctx):
        norm(f"{p}.norm", c)
        conv(f"{p}.proj_in", c, c, 1)
        conv(f"{p}.proj_out", c, c, 1)
        b = f"{p}.transformer_blocks.0"
        for ln in ("norm1", "norm2", "norm3"):
            norm(f"{b}.{ln}", c)
        for attn, kdim in (("attn1", c), ("attn2", ctx)):
            dense(f"{b}.{attn}.to_q", c, c, bias=False)
            dense(f"{b}.{attn}.to_k", c, kdim, bias=False)
            dense(f"{b}.{attn}.to_v", c, kdim, bias=False)
            dense(f"{b}.{attn}.to_out.0", c, c)
        dense(f"{b}.ff.net.0.proj", c * 8, c)
        dense(f"{b}.ff.net.2", c, c * 4)

    chans = cfg.block_out_channels
    temb = chans[0] * 4
    ctx = cfg.cross_attention_dim
    conv("conv_in", chans[0], cfg.in_channels)
    dense("time_embedding.linear_1", temb, chans[0])
    dense("time_embedding.linear_2", temb, temb)
    norm("conv_norm_out", chans[0])
    conv("conv_out", cfg.out_channels, chans[0])

    # down path
    skips = [chans[0]]
    cin = chans[0]
    for i, cout in enumerate(chans):
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", cin, cout, temb)
            if cfg.down_block_has_attn[i]:
                transformer(f"down_blocks.{i}.attentions.{j}", cout, ctx)
            cin = cout
            skips.append(cout)
        if i < len(chans) - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout)
            skips.append(cout)

    mid = chans[-1]
    resnet("mid_block.resnets.0", mid, mid, temb)
    transformer("mid_block.attentions.0", mid, ctx)
    resnet("mid_block.resnets.1", mid, mid, temb)

    # up path
    cin = mid
    for i, cout in enumerate(reversed(chans)):
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", cin + skip, cout, temb)
            if cfg.up_block_has_attn[i]:
                transformer(f"up_blocks.{i}.attentions.{j}", cout, ctx)
            cin = cout
        if i < len(chans) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout)
    return sd


def test_unet_converter_tiny_roundtrip():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    sd = _make_unet_sd(cfg)
    converted = weights.convert_unet(sd, cfg)
    lat = jnp.zeros((1, 16, 16, cfg.in_channels))
    ctx = jnp.zeros((1, 8, cfg.cross_attention_dim))
    expected = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), lat, jnp.zeros((1,), jnp.int32),
                          ctx))
    params = weights._check_tree(converted, expected, "unet")  # raises on any
    # converted weights actually run
    out = unet.apply(params, lat, jnp.asarray(3), ctx)
    assert out.shape == (1, 16, 16, cfg.out_channels)


def test_clip_text_converter_tiny_roundtrip():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    rng = np.random.default_rng(1)
    sd = {
        "text_model.embeddings.token_embedding.weight":
            rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(
                np.float32),
        "text_model.embeddings.position_embedding.weight":
            rng.standard_normal((cfg.max_length, cfg.hidden_size)).astype(
                np.float32),
        "text_model.final_layer_norm.weight":
            np.ones(cfg.hidden_size, np.float32),
        "text_model.final_layer_norm.bias":
            np.zeros(cfg.hidden_size, np.float32),
    }
    for i in range(cfg.num_layers):
        b = f"text_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{b}.{ln}.weight"] = np.ones(cfg.hidden_size, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(cfg.hidden_size, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{b}.self_attn.{proj}.weight"] = rng.standard_normal(
                (cfg.hidden_size, cfg.hidden_size)).astype(np.float32)
            sd[f"{b}.self_attn.{proj}.bias"] = np.zeros(cfg.hidden_size,
                                                        np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal(
            (cfg.intermediate_size, cfg.hidden_size)).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = np.zeros(cfg.intermediate_size, np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal(
            (cfg.hidden_size, cfg.intermediate_size)).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = np.zeros(cfg.hidden_size, np.float32)

    converted = weights.convert_clip_text(sd, cfg)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, cfg.max_length), jnp.int32)))
    params = weights._check_tree(converted, expected, "text")
    out = model.apply(params, jnp.zeros((1, cfg.max_length), jnp.int32))
    assert out.shape == (1, cfg.max_length, cfg.hidden_size)
