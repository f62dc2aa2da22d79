"""Latent-Paint application: SDS texture painting on a fixed mesh.

The TPU-native equivalent of the reference's latent_paint app
(scripts/train_latent_paint.py + src/latent_paint/training/trainer.py):
optimize a 4-channel latent UV texture (and background env-sphere colors)
through the differentiable rasterizer under text-conditioned SDS.

Implements the *upstream-correct* gradient semantics: the fork's latent_paint
trainer dropped the SDS backward entirely (reference trainer.py:127-131,
SURVEY.md Appendix A); here d(loss)/d(texture) flows by construction.
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
from tpunerf.guidance.stable_diffusion import StableDiffusionGuidance
from tpunerf.meshrep.textured_mesh import TexturedMeshScene
from tpunerf.training.config import TrainConfig


def directional_text_embeddings(guidance: StableDiffusionGuidance,
                                text: str, append_direction: bool,
                                negative_text: str = "") -> jnp.ndarray:
    """(D, 2, L, E) per-direction CFG embeddings (reference
    calc_text_embeddings, latent_paint/training/trainer.py:82-91).
    `negative_text` fills the uncond branch (guide.append_neg_text)."""
    neg = negative_text or None
    if not append_direction:
        emb = guidance.get_text_embeds([text], neg)     # (2, L, E)
        return emb[None]                                 # (1, 2, L, E)
    prompts = [f"{text}, {sfx}" for sfx in VIEW_DIRECTION_SUFFIXES]
    embs = guidance.get_text_embeds(prompts, neg)        # (2·6, L, E)
    n = len(prompts)
    return jnp.stack([jnp.stack([embs[i], embs[n + i]]) for i in range(n)])


def select_text_embeddings(text_z: jnp.ndarray, dirs: jnp.ndarray
                           ) -> jnp.ndarray:
    """Per-view direction select → (2B, L, E) with the uncond half first."""
    idx = jnp.where(text_z.shape[0] > 1, dirs, 0)
    sel = text_z[idx]                                    # (B, 2, L, E)
    return jnp.concatenate([sel[:, 0], sel[:, 1]], axis=0)


@dataclasses.dataclass
class LatentPaintApp:
    cfg: TrainConfig
    guidance: StableDiffusionGuidance
    scene: TexturedMeshScene
    text_z: jnp.ndarray

    @classmethod
    def create(cls, cfg: TrainConfig,
               guidance: Optional[StableDiffusionGuidance] = None,
               mesh=None) -> "LatentPaintApp":
        """`mesh` overrides `guide.shape_path` — the NeRF→mesh fitting stage
        passes an extracted mesh here (scripts/train_latent_nerf_mesh.py)."""
        latent_mode = cfg.render.nerf_type == "latent"
        if guidance is None:
            guidance = StableDiffusionGuidance.create(
                jax.random.key(cfg.optim.seed),
                tiny=cfg.guide.tiny_diffusion,
                model_dir=cfg.guide.model_dir,
                latent_mode=latent_mode,
                min_step=cfg.optim.min_step, max_step=cfg.optim.max_step,
                unet_dtype=cfg.guide.unet_dtype)
            guidance.maybe_load_concept(cfg.guide.concept_name)
        scene = TexturedMeshScene.create(
            mesh=mesh,
            shape_path=cfg.guide.shape_path,
            shape_scale=cfg.guide.shape_scale, dy=cfg.guide.dy,
            latent_mode=latent_mode,
            texture_resolution=cfg.guide.texture_resolution,
            render_grid_size=cfg.render.train_grid_size,
            interpolation_mode=cfg.guide.texture_interpolation_mode,
            cache_dir=cfg.log.exp_dir)
        scene.latent_size = guidance.latent_size
        neg = cfg.guide.negative_text if cfg.guide.append_neg_text else ""
        text_z = directional_text_embeddings(guidance, cfg.guide.text,
                                             cfg.guide.append_direction, neg)
        return cls(cfg=cfg, guidance=guidance, scene=scene, text_z=text_z)

    # ------------------------------------------------------------------ #
    def set_layout(self, layout) -> None:
        """Wire the device-mesh layout into the renderer: (B, H, …) image
        tensors get (data, rays)-constrained — batch over data, pixel rows
        over rays (SURVEY.md §5.7; VERDICT r3 task 5)."""
        self.scene.layout = layout

    def init_params(self, key: jax.Array) -> Any:
        return self.scene.init_params(key)

    # Large frozen guidance params as jit arguments (not closure constants)
    # — see trainer.py:_build_train_step.
    def frozen_refs(self) -> Any:
        return {"unet": self.guidance.unet_params,
                "vae": self.guidance.vae_params}

    def swap_frozen(self, refs: Any) -> Any:
        g = self.guidance
        prev = {"unet": g.unet_params, "vae": g.vae_params}
        g.unet_params = refs["unet"]
        g.vae_params = refs["vae"]
        return prev

    def loss_fn(self, params: Any, views: ViewBatch, key: jax.Array,
                step: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        render = self.scene.render_train(params, views)
        text_z = select_text_embeddings(self.text_z, views.dirs)
        loss = self.guidance.train_step_loss(
            key, text_z, render["image"],
            guidance_scale=self.cfg.guide.guidance_scale)
        aux = {"image": jax.lax.stop_gradient(render["image"])}
        return loss, aux

    def eval_render(self, params: Any, views: ViewBatch,
                    dims: Tuple[int, int]) -> Dict[str, jnp.ndarray]:
        return self.scene.render_test(params, views,
                                      decode_fn=self.guidance.decode_latents,
                                      dims=dims)

    def make_optimizer(self) -> optax.GradientTransformation:
        # Adam(lr, β=(0.9, 0.99), eps=1e-15) — reference trainer.py:93-95.
        # Non-trainable params (the RGB-finetune texture in latent mode)
        # get zero updates via masking.
        trainable = set(self.scene.trainable_keys())
        adam = optax.adam(self.cfg.optim.lr, b1=0.9, b2=0.99, eps=1e-15)
        return optax.multi_transform(
            {"train": adam, "freeze": optax.set_to_zero()},
            param_labels=lambda params: {
                k: ("train" if k in trainable else "freeze") for k in params})

    def export(self, params: Any, path: Path) -> None:
        self.scene.export_mesh(params, path,
                               decode_fn=self.guidance.decode_latents)

    def preview_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self.guidance.decode_latents(latents)

    def migrate_params(self, params: Any) -> Any:
        """On loading a latent-mode checkpoint into RGB mode, decode the
        latent texture as the finetune init (reference trainer.py:247-265)."""
        if not self.scene.latent_mode:
            rgb = np.asarray(params.get("texture_img_rgb_finetune"))
            if rgb is not None and np.abs(rgb).max() == 0:
                return self.scene.migrate_latent_to_rgb(
                    params, self.guidance.decode_latents)
        return params
