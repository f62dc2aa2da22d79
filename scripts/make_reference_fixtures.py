"""Generate the reference-parity fixture bank (run in the REFERENCE env).

BASELINE.json's acceptance gate is `allclose` against the reference's
kaolin/diffusers numerics; those libraries are not installable in the
zero-egress TPU environment (PARITY.md). This script is meant to run where
the reference runs (CUDA box with kaolin, diffusers, transformers) and dump
(input, output) pairs per kernel into .npz files; `tests/
test_reference_fixtures.py` then validates the TPU-native implementations
bit-level whenever the bank is present (env TPUNERF_FIXTURES or
tests/fixtures/reference/).

    python -m scripts.make_reference_fixtures --out tests/fixtures/reference \
        [--sd-model runwayml/stable-diffusion-v1-5]

Everything is seeded/deterministic. The SD fixtures (UNet ε, VAE round trip,
text embeddings, SDS gradient) are only written when --sd-model is given.
"""
from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np


def _sphere(n_theta=9, n_phi=12, radius=0.6):
    """Deterministic UV sphere with per-vertex UVs (no asset dependency)."""
    verts, uvs = [], []
    for i in range(n_theta):
        th = math.pi * i / (n_theta - 1)
        for j in range(n_phi):
            ph = 2 * math.pi * j / n_phi
            verts.append([radius * math.sin(th) * math.cos(ph),
                          radius * math.cos(th),
                          radius * math.sin(th) * math.sin(ph)])
            uvs.append([j / n_phi, i / (n_theta - 1)])
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = a + n_phi
            d = b + n_phi
            faces.append([a, b, c])
            faces.append([b, d, c])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int64),
            np.asarray(uvs, np.float32))


def dump_camera(out: Path):
    import torch
    import kaolin as kal

    thetas = np.linspace(0.1, 2.5, 7).astype(np.float32)
    phis = np.linspace(0.0, 6.2, 7).astype(np.float32)
    radii = np.linspace(1.0, 1.6, 7).astype(np.float32)
    mats = []
    for th, ph, r in zip(thetas, phis, radii):
        # the reference's spherical camera (latent_paint/models/render.py:20-31)
        x = r * math.sin(th) * math.sin(ph)
        y = r * math.cos(th)
        z = r * math.sin(th) * math.cos(ph)
        pos = torch.tensor([[x, y, z]])
        look_at = torch.zeros_like(pos)
        up = torch.tensor([[0.0, 1.0, 0.0]])
        mats.append(kal.render.camera.generate_transformation_matrix(
            pos, look_at, up)[0].numpy())
    proj = kal.render.camera.generate_perspective_projection(
        math.pi / 3, 1.0).numpy()
    np.savez(out / "camera.npz", thetas=thetas, phis=phis, radii=radii,
             transforms=np.stack(mats), projection=proj)


def dump_rasterize(out: Path):
    import torch
    import kaolin as kal

    verts, faces, uvs = _sphere()
    device = "cuda" if torch.cuda.is_available() else "cpu"
    vt = torch.from_numpy(verts).to(device)
    ft = torch.from_numpy(faces).to(device)
    uvt = torch.from_numpy(uvs).to(device)

    th, ph, r = 1.0, 0.7, 1.3
    x = r * math.sin(th) * math.sin(ph)
    y = r * math.cos(th)
    z = r * math.sin(th) * math.cos(ph)
    pos = torch.tensor([[x, y, z]], device=device)
    camt = kal.render.camera.generate_transformation_matrix(
        pos, torch.zeros_like(pos),
        torch.tensor([[0.0, 1.0, 0.0]], device=device))
    proj = kal.render.camera.generate_perspective_projection(
        math.pi / 3, 1.0).to(device)
    fv_cam, fv_img, fnorm = kal.render.mesh.prepare_vertices(
        vt, ft, proj, camera_transform=camt)
    uv_face = uvt[ft][None]                                   # (1, F, 3, 2)
    H = W = 64
    feats, face_idx = kal.render.mesh.rasterize(
        H, W, fv_cam[:, :, :, -1], fv_img, uv_face)
    np.savez(out / "rasterize.npz",
             verts=verts, faces=faces.astype(np.int32), uvs=uvs,
             theta=th, phi=ph, radius=r, height=H, width=W,
             uv_map=feats[0].detach().cpu().numpy(),
             face_idx=face_idx[0].detach().cpu().numpy(),
             fv_cam=fv_cam[0].detach().cpu().numpy(),
             fv_img=fv_img[0].detach().cpu().numpy())


def dump_texture_mapping(out: Path):
    import torch
    import kaolin as kal

    rng = np.random.default_rng(0)
    tex = rng.uniform(0, 1, (1, 4, 16, 16)).astype(np.float32)
    uv = rng.uniform(0, 1, (1, 32, 32, 2)).astype(np.float32)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    outs = {}
    for mode in ("nearest", "bilinear", "bicubic"):
        outs[mode] = kal.render.mesh.texture_mapping(
            torch.from_numpy(uv).to(device),
            torch.from_numpy(tex).to(device),
            mode=mode).detach().cpu().numpy()
    np.savez(out / "texture_mapping.npz", texture=tex, uv=uv, **outs)


def dump_sh_lighting(out: Path):
    import torch
    import kaolin as kal

    rng = np.random.default_rng(1)
    normals = rng.normal(0, 1, (1, 64, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    lights = rng.normal(0, 0.5, (9,)).astype(np.float32)
    lit = kal.render.mesh.spherical_harmonic_lighting(
        torch.from_numpy(normals), torch.from_numpy(lights)[None])
    np.savez(out / "sh_lighting.npz", normals=normals, lights=lights,
             lighting=lit.numpy())


def dump_scheduler(out: Path):
    from diffusers import DDIMScheduler

    sched = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                          beta_schedule="scaled_linear",
                          clip_sample=False, set_alpha_to_one=False)
    np.savez(out / "scheduler.npz",
             alphas_cumprod=sched.alphas_cumprod.numpy())


def dump_sd(out: Path, model: str):
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer

    device = "cuda" if torch.cuda.is_available() else "cpu"
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    tok = CLIPTokenizer.from_pretrained(model, subfolder="tokenizer")
    te = CLIPTextModel.from_pretrained(model, subfolder="text_encoder"
                                       ).to(device).eval()
    prompts = ["a photograph of an astronaut riding a horse", ""]
    ids = tok(prompts, padding="max_length", max_length=77,
              return_tensors="pt").input_ids
    with torch.no_grad():
        emb = te(ids.to(device))[0].cpu().numpy()

    unet = UNet2DConditionModel.from_pretrained(model, subfolder="unet"
                                                ).to(device).eval()
    lat = rng.normal(0, 1, (2, 4, 64, 64)).astype(np.float32)
    t = 501
    with torch.no_grad():
        eps = unet(torch.from_numpy(lat).to(device), t,
                   encoder_hidden_states=torch.from_numpy(emb).to(device)
                   ).sample.cpu().numpy()

    vae = AutoencoderKL.from_pretrained(model, subfolder="vae"
                                        ).to(device).eval()
    img = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        posterior = vae.encode(torch.from_numpy(img).to(device) * 2 - 1)
        lat_mode = (posterior.latent_dist.mode() * 0.18215).cpu().numpy()
        dec = vae.decode(torch.from_numpy(lat_mode).to(device) / 0.18215
                         ).sample.cpu().numpy()
    np.savez(out / "sd.npz", prompts=np.asarray(prompts), input_ids=ids,
             text_embeddings=emb, latents=lat, t=t, eps=eps,
             image=img, vae_latent_mode=lat_mode, vae_decoded=dec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path,
                    default=Path("tests/fixtures/reference"))
    ap.add_argument("--sd-model", type=str, default=None)
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    for fn in (dump_camera, dump_rasterize, dump_texture_mapping,
               dump_sh_lighting, dump_scheduler):
        try:
            fn(args.out)
            print(f"wrote {fn.__name__}")
        except Exception as e:                      # per-fixture best effort
            print(f"SKIP {fn.__name__}: {e}")
    if args.sd_model:
        dump_sd(args.out, args.sd_model)
        print("wrote dump_sd")


if __name__ == "__main__":
    main()
