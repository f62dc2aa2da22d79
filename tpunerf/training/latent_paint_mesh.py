"""Latent-Paint-Mesh application: soft-rasterized mesh painting + shaping.

TPU-native re-design of the fork's main app (scripts/train_latent_paint_mesh
+ src/latent_paint_mesh/training/trainer.py:31-871): DIB-R soft
rasterization, SH lighting, vertex displacement with Laplacian
regularization, dual body/head cameras, and three training modes dispatched
as loss strategies (reference `train_render_text` :565-743):

* mode 0 — Latent-Paint SDS on 64² latent renders (ref :656-660);
* mode 1 — TADA!: 512² RGB ×lighting + normal map, both VAE-encoded, a
  blended normal latent, two MSE-form SDS losses (ref :668-691);
* mode 2 — SDEdit: encode the render, renoise at a fixed step, DDIM-denoise,
  L2 between the denoised and rendered latents ×lighting (ref :695-710).

Guidance is StableDiffusion or PaintByExample by config (`guide.use_sd`,
ref :144-170); texture can be seeded from a reference sampled texture
(VAE-encoded — ref :67-84); CLIP image losses give the alternative
`train_render_clip` path (ref :519-544). Texture and displacement get
separate Adam transforms (ref :326-333).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpunerf.core.camera import VIEW_DIRECTION_SUFFIXES
from tpunerf.core.views import ViewBatch
from tpunerf.guidance.clip_vision import (CLIPImageEmbedder, CLIPVisionConfig,
                                          img_clip_loss)
from tpunerf.guidance.paint_by_example import PaintByExampleGuidance
from tpunerf.guidance.schedulers import ddim_step, ddim_timesteps
from tpunerf.guidance.stable_diffusion import (StableDiffusionGuidance,
                                               latent_to_rgb_preview)
from tpunerf.guidance import sds as sds_lib
from tpunerf.meshrep.textured_mesh import TexturedMeshScene
from tpunerf.training.config import TrainConfig
from tpunerf.training.latent_paint import (directional_text_embeddings,
                                           select_text_embeddings)


def _load_image(path: Path, size: int) -> jnp.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB").resize((size, size))
    return jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]


def _make_clip_embedder(cfg) -> Tuple[Any, Any]:
    """CLIP vision tower for the semantic CLIP losses (reference init_clip,
    latent_paint_mesh/training/trainer.py:172-180 — pretrained ViT-L).

    Pretrained weights load from `guide.clip_model_dir` (a transformers
    `CLIPVisionModelWithProjection` checkpoint dir). WITHOUT it the tower is
    random-init, which makes the CLIP loss noise guidance — fine for smoke
    tests, wrong for real runs (r3 advisor), so a warning is logged."""
    vcfg = (CLIPVisionConfig.tiny() if cfg.guide.tiny_diffusion
            else CLIPVisionConfig.vit_l_14())
    embedder = CLIPImageEmbedder(vcfg)
    probe = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    if cfg.guide.clip_model_dir is not None:
        from tpunerf.guidance import weights
        eparams = weights.load_clip_vision_params(
            Path(cfg.guide.clip_model_dir), embedder)
    else:
        if not cfg.guide.tiny_diffusion:
            import logging
            logging.getLogger("tpunerf").warning(
                "use_clip without guide.clip_model_dir: the CLIP tower is "
                "RANDOM-INIT — its loss is noise guidance, smoke-test only")
        eparams = jax.jit(embedder.init)(jax.random.key(cfg.optim.seed),
                                         probe)
    return embedder, eparams


@dataclasses.dataclass
class LatentPaintMeshApp:
    cfg: TrainConfig
    scene: TexturedMeshScene
    guidance: Optional[StableDiffusionGuidance]
    pbe: Optional[PaintByExampleGuidance]
    text_z: jnp.ndarray                  # body prompts (D, 2, L, E)
    text_z_head: jnp.ndarray             # head prompts (D, 2, L, E)
    image_embeds: Optional[jnp.ndarray] = None   # PbE exemplar embeds
    ref_image: Optional[jnp.ndarray] = None      # CLIP reference image
    clip: Optional[Tuple[Any, Any]] = None       # (embedder, params)
    depth_guidance: Optional[Any] = None         # SD-depth backend

    @classmethod
    def create(cls, cfg: TrainConfig,
               guidance: Optional[StableDiffusionGuidance] = None,
               pbe: Optional[PaintByExampleGuidance] = None,
               depth_guidance: Optional[Any] = None
               ) -> "LatentPaintMeshApp":
        latent_mode = cfg.optim.mode == 0
        use_sd = cfg.guide.use_sd
        use_depth = "depth" in cfg.guide.diffusion_name
        if not use_depth:
            depth_guidance = None      # only meaningful with a depth config
        if use_depth and depth_guidance is None:
            # depth-conditioned SD backend (BASELINE config #5: nascar
            # paint-mesh with depth conditioning + batched cameras)
            from tpunerf.guidance.depth import StableDiffusionDepthGuidance
            depth_guidance = StableDiffusionDepthGuidance.create(
                jax.random.key(cfg.optim.seed),
                tiny=cfg.guide.tiny_diffusion,
                model_dir=cfg.guide.model_dir,
                min_step=cfg.optim.min_step, max_step=cfg.optim.max_step,
                unet_dtype=cfg.guide.unet_dtype)
        if use_sd and not use_depth and guidance is None:
            guidance = StableDiffusionGuidance.create(
                jax.random.key(cfg.optim.seed),
                tiny=cfg.guide.tiny_diffusion,
                model_dir=cfg.guide.model_dir, latent_mode=latent_mode,
                min_step=cfg.optim.min_step, max_step=cfg.optim.max_step,
                unet_dtype=cfg.guide.unet_dtype)
            guidance.maybe_load_concept(cfg.guide.concept_name)
        if not use_sd and pbe is None:
            # guide.model_dir names the Paint-by-Example checkpoint dir on
            # this path (reference paint_by_example_dir, train_config.py:49)
            # PbE keeps its own t∈[0.2, 0.6] window (reference pbe :82-83),
            # independent of optim.min/max_step
            pbe = PaintByExampleGuidance.create(
                jax.random.key(cfg.optim.seed),
                tiny=cfg.guide.tiny_diffusion,
                model_dir=cfg.guide.model_dir,
                unet_dtype=cfg.guide.unet_dtype)

        scene = TexturedMeshScene.create(
            shape_path=cfg.guide.shape_path,
            shape_scale=cfg.guide.shape_scale, dy=cfg.guide.dy,
            latent_mode=latent_mode,
            texture_resolution=cfg.guide.texture_resolution,
            render_grid_size=cfg.render.train_grid_size,
            interpolation_mode=cfg.guide.texture_interpolation_mode,
            cache_dir=cfg.log.exp_dir, enable_displacement=True,
            dual_camera=cfg.render.body_prob < 1.0,
            soft_mask_sigma=1e-4)
        text_backend = depth_guidance if depth_guidance is not None \
            else guidance
        if text_backend is not None:
            scene.latent_size = text_backend.latent_size

        # body + head prompt banks (reference trainer :212-237)
        if text_backend is not None:
            neg = cfg.guide.negative_text if cfg.guide.append_neg_text else ""
            text_z = directional_text_embeddings(
                text_backend, cfg.guide.text, cfg.guide.append_direction, neg)
            head_prompt = f"a close up face of {cfg.guide.text}"
            text_z_head = directional_text_embeddings(
                text_backend, head_prompt, cfg.guide.append_direction, neg)
        else:
            text_z = text_z_head = jnp.zeros((1, 2, 1, 1))

        if cfg.optim.use_clip and pbe is not None and cfg.guide.image is None:
            # the low-t CLIP branch compares against the reference image;
            # without one, clip stays None and the use_clip flag would trip
            # an assert at trace time (r3 advisor)
            raise ValueError(
                "optim.use_clip with the Paint-by-Example backend requires "
                "guide.image (the reference exemplar the CLIP loss compares "
                "against — reference paint_by_example.py:658-664)")
        image_embeds = None
        ref_image = None
        clip = None
        if cfg.guide.image is not None:
            size = (pbe.image_size if pbe is not None else 512)
            ref_image = _load_image(cfg.guide.image, size)
            if pbe is not None:
                image_embeds = pbe.encode_exemplar(ref_image)
                if cfg.optim.use_clip:
                    # CLIP tower for the PbE low-t CLIP-loss branch
                    # (reference pbe :658-664, clip_model from init_clip)
                    clip = _make_clip_embedder(cfg)
            else:
                # CLIP tower for the train_render_clip path
                # (reference init_clip, trainer.py:172-180)
                clip = _make_clip_embedder(cfg)

        return cls(cfg=cfg, scene=scene, guidance=guidance, pbe=pbe,
                   text_z=text_z, text_z_head=text_z_head,
                   image_embeds=image_embeds, ref_image=ref_image,
                   clip=clip, depth_guidance=depth_guidance)

    # ------------------------------------------------------------------ #
    def set_layout(self, layout) -> None:
        """Wire the device-mesh layout into the renderer: (B, H, …) image
        tensors get (data, rays)-constrained — batch over data, pixel rows
        over rays (SURVEY.md §5.7; VERDICT r3 task 5)."""
        self.scene.layout = layout

    # Large frozen guidance params as jit arguments (not closure constants)
    # — see trainer.py:_build_train_step. Covers whichever backends this
    # config instantiated (SD / depth+inpaint / PbE / CLIP tower).
    def frozen_refs(self) -> Any:
        refs: Dict[str, Any] = {}
        if self.guidance is not None:
            refs["sd"] = {"unet": self.guidance.unet_params,
                          "vae": self.guidance.vae_params}
        if self.depth_guidance is not None:
            d = self.depth_guidance
            refs["depth"] = {"unet": d.unet_params, "vae": d.vae_params,
                             "inpaint": d.inpaint_unet_params}
        if self.pbe is not None:
            refs["pbe"] = {"unet": self.pbe.unet_params,
                           "vae": self.pbe.vae_params,
                           "enc": self.pbe.image_encoder_params}
        if self.clip is not None:
            refs["clip"] = self.clip[1]
        return refs

    def swap_frozen(self, refs: Any) -> Any:
        prev: Dict[str, Any] = {}
        if "sd" in refs:
            g = self.guidance
            prev["sd"] = {"unet": g.unet_params, "vae": g.vae_params}
            g.unet_params = refs["sd"]["unet"]
            g.vae_params = refs["sd"]["vae"]
        if "depth" in refs:
            d = self.depth_guidance
            prev["depth"] = {"unet": d.unet_params, "vae": d.vae_params,
                             "inpaint": d.inpaint_unet_params}
            d.unet_params = refs["depth"]["unet"]
            d.vae_params = refs["depth"]["vae"]
            d.inpaint_unet_params = refs["depth"]["inpaint"]
        if "pbe" in refs:
            p = self.pbe
            prev["pbe"] = {"unet": p.unet_params, "vae": p.vae_params,
                           "enc": p.image_encoder_params}
            p.unet_params = refs["pbe"]["unet"]
            p.vae_params = refs["pbe"]["vae"]
            p.image_encoder_params = refs["pbe"]["enc"]
        if "clip" in refs:
            prev["clip"] = self.clip[1]
            self.clip = (self.clip[0], refs["clip"])
        return prev

    def init_params(self, key: jax.Array) -> Any:
        tex_lat = tex_rgb = None
        if self.cfg.guide.sampled_texture is not None:
            # texture init from reference sampled texture (ref :67-84)
            R = self.scene.texture_resolution
            img = _load_image(self.cfg.guide.sampled_texture,
                              max(R * 4, 64))
            if self.guidance is not None:
                lat = self.guidance.encode_imgs_mode(img)
                lat = jax.image.resize(lat, (1, R, R, 4), method="bilinear")
                tex_lat = lat
            tex_rgb = jax.image.resize(img, (1, R, R, 3), method="bilinear")
        return self.scene.init_params(key, texture_latents=tex_lat,
                                      texture_rgb=tex_rgb)

    # ------------------------------------------------------------------ #
    def _select_text(self, views: ViewBatch) -> jnp.ndarray:
        """Body/head prompt-bank select per view (ref :636-640)."""
        body = select_text_embeddings(self.text_z, views.dirs)
        head = select_text_embeddings(self.text_z_head, views.dirs)
        sel = views.is_body.astype(jnp.float32)
        sel2 = jnp.concatenate([sel, sel])[:, None, None]
        return body * sel2 + head * (1.0 - sel2)

    def loss_fn(self, params: Any, views: ViewBatch, key: jax.Array,
                step: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        mode = cfg.optim.mode
        k_sds, k_aux = jax.random.split(key)

        render = self.scene.render_train(params, views,
                                         with_lighting=mode != 0)
        image = render["image"]
        aux: Dict[str, Any] = {"image": jax.lax.stop_gradient(image)}

        if mode == 0:
            # Latent-Paint SDS (ref :656-660)
            if self.depth_guidance is not None:
                from tpunerf.guidance.depth import normalize_depth
                text_z = self._select_text(views)
                depth = jax.lax.stop_gradient(
                    normalize_depth(render["depth"], render["mask"]))
                main = self.depth_guidance.train_step_loss(
                    k_sds, text_z, image, depth,
                    guidance_scale=cfg.guide.guidance_scale)
            elif self.guidance is not None:
                text_z = self._select_text(views)
                main = self.guidance.train_step_loss(
                    k_sds, text_z, image,
                    guidance_scale=cfg.guide.guidance_scale)
            else:
                mask = jax.lax.stop_gradient(render["mask"])
                clip_fn = None
                clip_size = 224
                if cfg.optim.use_clip and self.clip is not None:
                    embedder, eparams = self.clip
                    clip_fn = lambda p: embedder.apply(eparams, p)  # noqa: E731
                    clip_size = embedder.config.image_size
                main = self.pbe.train_step_loss(
                    k_sds, image, mask, self.image_embeds,
                    guidance_scale=cfg.guide.guidance_scale,
                    use_clip=cfg.optim.use_clip and clip_fn is not None,
                    clip_embed_fn=clip_fn,
                    ref_image01=self.ref_image, clip_image_size=clip_size)
        elif mode == 1:
            main = self._tada_loss(k_sds, render, views)
        elif mode == 2:
            main = self._sdedit_loss(k_sds, render, views)
        else:
            raise ValueError(f"unknown optim.mode {mode}")

        loss = main
        if "laplacian_loss" in render:
            loss = loss + cfg.optim.lambda_laplacian * render["laplacian_loss"]
            loss = loss + cfg.optim.lambda_displacement * \
                render["displacement_norm"]
            aux["laplacian_loss"] = render["laplacian_loss"]
        return loss, aux

    def _tada_loss(self, key, render, views) -> jnp.ndarray:
        """TADA! mode (ref :668-691): shaded RGB + blended-normal latent,
        two SDS gradients in MSE form."""
        g = self.guidance
        k1, k2, k3 = jax.random.split(key, 3)
        text_z = self._select_text(views)
        shaded = render["image"]
        if render["lighting"] is not None:
            shaded = shaded * render["lighting"]
        lat_img = g.encode_imgs(
            jax.image.resize(shaded, (shaded.shape[0], g.image_size,
                                      g.image_size, shaded.shape[-1]),
                             method="bilinear"), k1)
        normals01 = (render["normals"] + 1.0) / 2.0 if render["normals"] \
            is not None else jnp.ones_like(shaded)
        lat_nrm = g.encode_imgs(
            jax.image.resize(normals01, (normals01.shape[0], g.image_size,
                                         g.image_size, 3),
                             method="bilinear"), k2)
        alpha = 0.5
        lat_blend = alpha * lat_img + (1 - alpha) * lat_nrm
        loss_img = sds_lib.sds_loss(g.unet_apply, g.sched, k3, lat_img,
                                    text_z, self.cfg.guide.guidance_scale,
                                    g.min_step, g.max_step)
        loss_nrm = sds_lib.sds_loss(g.unet_apply, g.sched,
                                    jax.random.fold_in(k3, 1), lat_blend,
                                    text_z, self.cfg.guide.guidance_scale,
                                    g.min_step, g.max_step)
        return loss_img + 0.5 * loss_nrm

    def _sdedit_loss(self, key, render, views,
                     noise_step_index: int = 40) -> jnp.ndarray:
        """SDEdit mode (ref :695-710): renoise the rendered latent at a fixed
        DDIM step, denoise one step, L2 pull toward the denoised target."""
        g = self.guidance
        k1, k2 = jax.random.split(key)
        text_z = self._select_text(views)
        shaded = render["image"]
        if render["lighting"] is not None:
            shaded = shaded * render["lighting"]
        lat = g.encode_imgs(
            jax.image.resize(shaded, (shaded.shape[0], g.image_size,
                                      g.image_size, shaded.shape[-1]),
                             method="bilinear"), k1)
        ts = ddim_timesteps(self.cfg.guide.num_inference_steps)
        t = ts[jnp.minimum(noise_step_index, ts.shape[0] - 1)]
        noise = jax.random.normal(k2, lat.shape)
        lat_noisy = g.sched.add_noise(jax.lax.stop_gradient(lat), noise, t)
        eps = sds_lib.cfg_eps(g.unet_apply, lat_noisy, t, text_z,
                              self.cfg.guide.guidance_scale)
        target = ddim_step(g.sched, eps, t, lat_noisy,
                           self.cfg.guide.num_inference_steps).pred_x0
        return jnp.mean((lat - jax.lax.stop_gradient(target)) ** 2)

    def clip_loss(self, params: Any, views: ViewBatch) -> jnp.ndarray:
        """Alternative CLIP path (`train_render_clip`, ref :519-544): linear
        latent→RGB preview vs the reference image."""
        assert self.ref_image is not None and self.clip is not None
        render = self.scene.render_train(params, views)
        rgb = latent_to_rgb_preview(render["image"]) \
            if render["image"].shape[-1] == 4 else render["image"]
        embedder, eparams = self.clip
        return img_clip_loss(lambda p: embedder.apply(eparams, p), rgb,
                             self.ref_image,
                             size=embedder.config.image_size)

    # ------------------------------------------------------------------ #
    def _decode_fn(self):
        if self.depth_guidance is not None:
            return self.depth_guidance.decode_latents
        if self.guidance is not None:
            return self.guidance.decode_latents
        return self.pbe.decode_latents

    def eval_render(self, params: Any, views: ViewBatch,
                    dims: Tuple[int, int]) -> Dict[str, jnp.ndarray]:
        decode = self._decode_fn()
        return self.scene.render_test(params, views, decode_fn=decode,
                                      dims=dims,
                                      with_lighting=self.cfg.optim.mode != 0)

    def make_optimizer(self) -> optax.GradientTransformation:
        cfg = self.cfg
        tex = optax.adam(cfg.optim.lr, b1=0.9, b2=0.99, eps=1e-15)
        disp = optax.adam(cfg.optim.disp_lr, b1=0.9, b2=0.99, eps=1e-15)
        trainable = set(self.scene.trainable_keys())

        def label(params):
            out = {}
            for k in params:
                if k in ("displacement", "lights"):
                    out[k] = "disp"
                elif k in trainable:
                    out[k] = "tex"
                else:
                    out[k] = "freeze"
            return out

        return optax.multi_transform(
            {"tex": tex, "disp": disp, "freeze": optax.set_to_zero()},
            param_labels=label)

    def export(self, params: Any, path: Path) -> None:
        self.scene.export_mesh(params, path, decode_fn=self._decode_fn())

    def preview_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self._decode_fn()(latents)

    def migrate_params(self, params: Any) -> Any:
        return params
