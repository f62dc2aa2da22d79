"""CLI: convert a diffusers-layout Stable-Diffusion checkpoint → tpunerf
params file.

The reference loads SD weights straight from the HuggingFace hub at trainer
init (reference src/stable_diffusion.py:77-111); this framework loads them
through guidance/weights.py, which converts the torch/diffusers tensor
layout to the Flax module trees (conv OIHW→HWIO, dense transpose) with full
name/shape validation. This script does the conversion once, offline, and
writes a single .npz the guidance stack can memory-map at startup:

    python -m scripts.convert_sd_weights \
        --model_dir /path/to/stable-diffusion-v1-4 \
        --out weights/sd_v1_4.npz [--dtype bfloat16]

`model_dir` is a local diffusers snapshot (unet/, vae/, text_encoder/
subfolders with *.safetensors or *.bin). Loading at train time:
`StableDiffusion.create(..., weights_path="weights/sd_v1_4.npz")`.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def flatten_tree(tree, prefix=""):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[prefix + jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_dir", type=Path, required=True,
                    help="diffusers snapshot dir (unet/, vae/, text_encoder/)")
    ap.add_argument("--out", type=Path, required=True, help="output .npz")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--variant", default="sd_v1",
                    choices=["sd_v1", "sd_v1_9ch", "sd2_depth"],
                    help="UNet input layout: 4-ch text SD, 9-ch inpaint/PbE, "
                         "5-ch depth-conditioned")
    args = ap.parse_args()

    from tpunerf.guidance.unet import UNet2DCondition, UNetConfig
    from tpunerf.guidance import vae as vae_lib
    from tpunerf.guidance.clip_text import CLIPText, CLIPTextConfig
    from tpunerf.guidance.weights import load_sd_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    in_channels = {"sd_v1": 4, "sd_v1_9ch": 9, "sd2_depth": 5}[args.variant]
    unet = UNet2DCondition(UNetConfig.sd_v1(in_channels=in_channels,
                                            dtype=dtype))
    vae = vae_lib.VAE(vae_lib.VAEConfig.sd_v1(dtype=dtype))
    text = CLIPText(CLIPTextConfig.vit_l_14(dtype=dtype))

    unet_p, vae_p, text_p = load_sd_params(args.model_dir, unet, vae, text)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float32 if dtype == jnp.float32
                             else jnp.bfloat16), t)
    flat = {}
    flat.update(flatten_tree(cast(unet_p), "unet"))
    flat.update(flatten_tree(cast(vae_p), "vae"))
    flat.update(flatten_tree(cast(text_p), "text"))

    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, **flat)
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"wrote {args.out}: {len(flat)} tensors, {n_params/1e6:.1f}M params,"
          f" dtype={args.dtype}")


if __name__ == "__main__":
    main()
