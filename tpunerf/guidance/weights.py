"""torch/diffusers checkpoint → flax parameter conversion.

The reference pulls SD weights from the HF hub through diffusers/transformers
(src/stable_diffusion.py:77-110). This framework implements the models
natively (unet.py / vae.py / clip_text.py); this module maps a diffusers-layout
checkpoint directory

    model_dir/
      unet/diffusion_pytorch_model.safetensors   (or .bin)
      vae/diffusion_pytorch_model.safetensors
      text_encoder/model.safetensors             (or pytorch_model.bin)
      tokenizer/vocab.json, merges.txt

onto the flax module trees, converting layouts (conv OIHW→HWIO, linear
(O,I)→(I,O)) and validating every leaf shape against `jax.eval_shape` of the
target module. Works for SD v1.x, the 5-channel depth UNet
(stable_diffusion_depth.py:341-344) and the 9-channel Paint-by-Example UNet
(paint_by_example.py:643-646) — only `in_channels` differs.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _load_state_dict(path_base: Path) -> Dict[str, np.ndarray]:
    st = path_base.with_suffix(".safetensors")
    if st.exists():
        from safetensors import safe_open
        out = {}
        with safe_open(st, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    bin_path = path_base.with_suffix(".bin")
    if bin_path.exists():
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no checkpoint at {path_base}(.safetensors/.bin)")


def _conv(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{key}.bias"]}


def _dense(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"]),
            "bias": sd[f"{key}.bias"]}


def _dense_nobias(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"])}


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _resnet(sd, p) -> Dict[str, Any]:
    out = {"norm1": _norm(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
           "time_emb_proj": _dense(sd, f"{p}.time_emb_proj"),
           "norm2": _norm(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2")}
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _vae_resnet(sd, p) -> Dict[str, Any]:
    out = {"norm1": _norm(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
           "norm2": _norm(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2")}
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attention(sd, p) -> Dict[str, Any]:
    return {"to_q": _dense_nobias(sd, f"{p}.to_q"),
            "to_k": _dense_nobias(sd, f"{p}.to_k"),
            "to_v": _dense_nobias(sd, f"{p}.to_v"),
            "to_out": _dense(sd, f"{p}.to_out.0")}


def _transformer2d(sd, p) -> Dict[str, Any]:
    b = f"{p}.transformer_blocks.0"
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
        "block_0": {
            "norm1": _norm(sd, f"{b}.norm1"),
            "attn1": _attention(sd, f"{b}.attn1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn2": _attention(sd, f"{b}.attn2"),
            "norm3": _norm(sd, f"{b}.norm3"),
            "ff": {"proj": _dense(sd, f"{b}.ff.net.0.proj"),
                   "out": _dense(sd, f"{b}.ff.net.2")},
        },
    }


def convert_unet(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2")},
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1"),
        "mid_attn": _transformer2d(sd, "mid_block.attentions.0"),
    }
    n = len(config.block_out_channels)
    for i in range(n):
        for j in range(config.layers_per_block):
            p[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if config.down_block_has_attn[i]:
                p[f"down_{i}_attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}")
        if i < n - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    for i in range(n):
        for j in range(config.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if config.up_block_has_attn[i]:
                p[f"up_{i}_attn_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}")
        if i < n - 1:
            p[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return {"params": p}


def _vae_attention(sd, p) -> Dict[str, Any]:
    # diffusers ≥0.18 names: group_norm + to_q/to_k/to_v/to_out.0;
    # older: norm + query/key/value/proj_attn.
    if f"{p}.to_q.weight" in sd:
        return {"group_norm": _norm(sd, f"{p}.group_norm"),
                "to_q": _dense(sd, f"{p}.to_q"),
                "to_k": _dense(sd, f"{p}.to_k"),
                "to_v": _dense(sd, f"{p}.to_v"),
                "to_out": _dense(sd, f"{p}.to_out.0")}
    return {"group_norm": _norm(sd, f"{p}.norm"),
            "to_q": _dense(sd, f"{p}.query"),
            "to_k": _dense(sd, f"{p}.key"),
            "to_v": _dense(sd, f"{p}.value"),
            "to_out": _dense(sd, f"{p}.proj_attn")}


def convert_vae(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    n = len(config.block_out_channels)
    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid_res_0": _vae_resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_res_1": _vae_resnet(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attention(sd, "encoder.mid_block.attentions.0"),
    }
    for i in range(n):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid_res_0": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_res_1": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attention(sd, "decoder.mid_block.attentions.0"),
    }
    for i in range(n):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    return {"params": {"encoder": enc, "decoder": dec,
                       "quant_conv": _conv(sd, "quant_conv"),
                       "post_quant_conv": _conv(sd, "post_quant_conv")}}


def convert_clip_text(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    p: Dict[str, Any] = {
        "token_embedding": {
            "embedding": sd[f"{pre}embeddings.token_embedding.weight"]},
        "position_embedding":
            sd[f"{pre}embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
    }
    for i in range(config.num_layers):
        b = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm1": _norm(sd, f"{b}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{b}.layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{b}.self_attn.out_proj")},
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    return {"params": p}


def convert_clip_vision(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """transformers `CLIPVisionModelWithProjection` state dict → flax
    `CLIPImageEmbedder` params (the `encode_image` tower the reference uses
    through OpenAI CLIP — latent_paint_mesh/training/trainer.py:172-180 —
    and inside Paint-by-Example's exemplar encoder, paint_by_example.py:705).

    Handles both prefixed (`vision_model.`) and bare layouts. Note the HF
    field is literally spelled `pre_layrnorm` (upstream typo)."""
    pre = ("vision_model."
           if any(k.startswith("vision_model.") for k in sd) else "")
    emb = f"{pre}embeddings."
    pre_ln_key = (f"{pre}pre_layrnorm"
                  if f"{pre}pre_layrnorm.weight" in sd
                  else f"{pre}pre_layernorm")
    v: Dict[str, Any] = {
        # conv OIHW → HWIO
        "patch_embedding": {
            "kernel": sd[f"{emb}patch_embedding.weight"
                         ].transpose(2, 3, 1, 0)},
        "class_embedding": sd[f"{emb}class_embedding"],
        "position_embedding": sd[f"{emb}position_embedding.weight"],
        "pre_layernorm": _norm(sd, pre_ln_key),
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
    }
    for i in range(config.num_layers):
        b = f"{pre}encoder.layers.{i}"
        v[f"layer_{i}_ln1"] = _norm(sd, f"{b}.layer_norm1")
        v[f"layer_{i}_ln2"] = _norm(sd, f"{b}.layer_norm2")
        v[f"layer_{i}_attn"] = {
            "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{b}.self_attn.out_proj")}
        v[f"layer_{i}_fc1"] = _dense(sd, f"{b}.mlp.fc1")
        v[f"layer_{i}_fc2"] = _dense(sd, f"{b}.mlp.fc2")
    params: Dict[str, Any] = {"vision": v}
    if "visual_projection.weight" in sd:
        params["visual_projection"] = {
            "kernel": sd["visual_projection.weight"].T}
    return {"params": params}


def convert_pbe_image_encoder(sd: Dict[str, np.ndarray], vision_config,
                              num_blocks: int) -> Dict[str, Any]:
    """HF `PaintByExampleImageEncoder` state dict → flax params
    (guidance/paint_by_example.PaintByExampleImageEncoder; reference
    consumes the torch module at paint_by_example.py:705-751).

    Layout: `model.vision_model.*` CLIP tower, `mapper.blocks.{i}.*`
    1-head transformer blocks (attention_bias=True, erf-GELU FF),
    `final_layer_norm`, `proj_out`, `uncond_vector`."""
    vis_sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    vision = convert_clip_vision(vis_sd, vision_config)["params"]["vision"]
    p: Dict[str, Any] = {
        "model": vision,
        "uncond_vector": sd["uncond_vector"],
        "final_layer_norm": _norm(sd, "final_layer_norm"),
        "proj_out": _dense(sd, "proj_out"),
    }
    for i in range(num_blocks):
        b = f"mapper.blocks.{i}"
        p[f"block_{i}_norm1"] = _norm(sd, f"{b}.norm1")
        p[f"block_{i}_q"] = _dense(sd, f"{b}.attn1.to_q")
        p[f"block_{i}_k"] = _dense(sd, f"{b}.attn1.to_k")
        p[f"block_{i}_v"] = _dense(sd, f"{b}.attn1.to_v")
        p[f"block_{i}_out"] = _dense(sd, f"{b}.attn1.to_out.0")
        p[f"block_{i}_norm3"] = _norm(sd, f"{b}.norm3")
        p[f"block_{i}_fc1"] = _dense(sd, f"{b}.ff.net.0.proj")
        p[f"block_{i}_fc2"] = _dense(sd, f"{b}.ff.net.2")
    return {"params": p}


def load_unet_params(model_dir: Path, unet) -> Any:
    """Load just a UNet from a diffusers-layout directory (used for the
    SD2-inpainting 9-ch UNet of the depth backend, reference
    stable_diffusion_depth.py:59-62)."""
    model_dir = Path(model_dir)
    ucfg = unet.config
    unet_sd = _load_state_dict(model_dir / "unet" / "diffusion_pytorch_model")
    lat = jnp.zeros((1, 64, 64, ucfg.in_channels))
    ctx = jnp.zeros((1, 77, ucfg.cross_attention_dim))
    unet_shapes = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), lat, jnp.zeros((1,), jnp.int32),
                          ctx))
    return _check_tree(convert_unet(unet_sd, ucfg), unet_shapes,
                       "inpaint_unet")


def load_clip_vision_params(model_dir: Path, embedder) -> Any:
    """Load a transformers `CLIPVisionModelWithProjection` checkpoint dir
    onto a `CLIPImageEmbedder` (the pretrained tower for the semantic CLIP
    losses — reference init_clip, latent_paint_mesh/training/trainer.py:
    172-180). Probes `model` then `pytorch_model` like the other loaders."""
    model_dir = Path(model_dir)
    vcfg = embedder.config
    sd = None
    for base in ("model", "pytorch_model"):
        try:
            sd = _load_state_dict(model_dir / base)
            break
        except FileNotFoundError:
            continue
    if sd is None:
        raise FileNotFoundError(
            f"no model(.safetensors/.bin) under {model_dir}")
    probe = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    shapes = jax.eval_shape(
        lambda: embedder.init(jax.random.key(0), probe))
    return _check_tree(convert_clip_vision(sd, vcfg), shapes, "clip_vision")


def load_pbe_params(model_dir: Path, unet, vae, image_encoder
                    ) -> Tuple[Any, Any, Any]:
    """Load + convert a diffusers-layout Paint-by-Example checkpoint
    directory (unet/, vae/, image_encoder/) onto the flax modules
    (VERDICT r2 task 4 — real-weights path for PbE)."""
    from tpunerf.guidance.paint_by_example import pbe_num_mapper_blocks

    model_dir = Path(model_dir)
    ucfg, vcfg = unet.config, vae.config
    vis = image_encoder.vision_config

    unet_sd = _load_state_dict(model_dir / "unet" / "diffusion_pytorch_model")
    vae_sd = _load_state_dict(model_dir / "vae" / "diffusion_pytorch_model")
    try:
        enc_sd = _load_state_dict(model_dir / "image_encoder" / "model")
    except FileNotFoundError:
        enc_sd = _load_state_dict(
            model_dir / "image_encoder" / "pytorch_model")

    lat = jnp.zeros((1, 64, 64, ucfg.in_channels))
    ctx = jnp.zeros((1, 1, ucfg.cross_attention_dim))
    unet_shapes = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), lat, jnp.zeros((1,), jnp.int32),
                          ctx))
    vae_shapes = jax.eval_shape(
        lambda: vae.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                         jax.random.key(0)))
    enc_shapes = jax.eval_shape(
        lambda: image_encoder.init(
            jax.random.key(0),
            jnp.zeros((1, vis.image_size, vis.image_size, 3))))

    unet_params = _check_tree(convert_unet(unet_sd, ucfg), unet_shapes,
                              "unet")
    vae_params = _check_tree(convert_vae(vae_sd, vcfg), vae_shapes, "vae")
    enc_params = _check_tree(
        convert_pbe_image_encoder(enc_sd, vis, pbe_num_mapper_blocks(vis)),
        enc_shapes, "image_encoder")
    return unet_params, vae_params, enc_params


def _check_tree(converted, expected_shapes, name: str) -> Any:
    """Assert converted leaves match the module's expected shapes exactly."""
    conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    exp_flat = dict(jax.tree_util.tree_flatten_with_path(expected_shapes)[0])
    conv_keys = {jax.tree_util.keystr(k) for k, _ in conv_flat}
    exp_keys = set(jax.tree_util.keystr(k) for k in exp_flat)
    missing = exp_keys - conv_keys
    extra = conv_keys - exp_keys
    if missing or extra:
        raise ValueError(f"{name}: param-tree mismatch; missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")
    for k, v in conv_flat:
        ks = jax.tree_util.keystr(k)
        exp = exp_flat[[kk for kk in exp_flat if jax.tree_util.keystr(kk) == ks][0]]
        if tuple(v.shape) != tuple(exp.shape):
            raise ValueError(f"{name}: shape mismatch at {ks}: "
                             f"{v.shape} vs expected {exp.shape}")
    return jax.tree_util.tree_map(jnp.asarray, converted)


def load_sd_params(model_dir: Path, unet, vae, text
                   ) -> Tuple[Any, Any, Any]:
    """Load + convert a diffusers-layout SD checkpoint directory."""
    model_dir = Path(model_dir)
    ucfg, vcfg, tcfg = unet.config, vae.config, text.config

    unet_sd = _load_state_dict(model_dir / "unet" / "diffusion_pytorch_model")
    vae_sd = _load_state_dict(model_dir / "vae" / "diffusion_pytorch_model")
    try:
        text_sd = _load_state_dict(model_dir / "text_encoder" / "model")
    except FileNotFoundError:
        text_sd = _load_state_dict(model_dir / "text_encoder" / "pytorch_model")

    lat = jnp.zeros((1, 64, 64, ucfg.in_channels))
    ctx = jnp.zeros((1, tcfg.max_length, ucfg.cross_attention_dim))
    unet_shapes = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), lat, jnp.zeros((1,), jnp.int32),
                          ctx))
    vae_shapes = jax.eval_shape(
        lambda: vae.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                         jax.random.key(0)))
    text_shapes = jax.eval_shape(
        lambda: text.init(jax.random.key(0),
                          jnp.zeros((1, tcfg.max_length), jnp.int32)))

    unet_params = _check_tree(convert_unet(unet_sd, ucfg), unet_shapes, "unet")
    vae_params = _check_tree(convert_vae(vae_sd, vcfg), vae_shapes, "vae")
    text_params = _check_tree(convert_clip_text(text_sd, tcfg), text_shapes,
                              "text_encoder")
    return unet_params, vae_params, text_params
