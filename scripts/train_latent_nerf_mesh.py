"""CLI: NeRF→mesh fitting stage (reference scripts/train_latent_nerf_mesh.py
— the second broken-import entry point this framework reconstructs;
SURVEY.md §2.5: "marching cubes on density grid + latent-paint fine-tune").

Loads a trained latent-NeRF checkpoint (`--optim.ckpt` — recipe at
reference run_latent_paint.txt:35-39), extracts the density iso-surface,
and runs Latent-Paint texture optimization on the extracted mesh.

Usage:
    python -m scripts.train_latent_nerf_mesh \
        --log.exp_name castle_mesh --guide.text "a sand castle" \
        --optim.ckpt experiments/sand_castle/checkpoints/step_005000.ckpt
"""
import dataclasses

import jax

from tpunerf.core.config import parse
from tpunerf.training.config import TrainConfig
from tpunerf.training.checkpoints import CheckpointManager
from tpunerf.training.latent_nerf_app import LatentNeRFApp
from tpunerf.training.latent_paint import LatentPaintApp
from tpunerf.training.trainer import Trainer


def extract_mesh_from_checkpoint(cfg: TrainConfig,
                                 resolution: int | None = None,
                                 iso: float | None = None):
    """Restore the NeRF and extract its density iso-surface as a Mesh."""
    import jax.numpy as jnp
    from tpunerf.meshrep.mesh import Mesh

    nerf_cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, backbone="latent-nerf"))
    nerf_app = LatentNeRFApp.create(nerf_cfg)
    template = nerf_app.init_params(jax.random.key(0))
    mgr = CheckpointManager(cfg.log.exp_dir / "checkpoints")
    params, _, _ = mgr.load(cfg.optim.ckpt, params_template=template)
    if params is None:
        raise FileNotFoundError(
            "no NeRF checkpoint found — pass --optim.ckpt")
    resolution = cfg.render.mc_resolution if resolution is None else resolution
    iso = cfg.render.iso_level if iso is None else iso
    verts, faces = nerf_app.scene.extract_mesh(
        jax.tree_util.tree_map(jnp.asarray, params),
        resolution=resolution, iso=iso)
    if len(faces) == 0:
        raise RuntimeError(f"no surface at isolevel {iso}")
    return Mesh(vertices=jnp.asarray(verts), faces=jnp.asarray(faces))


def main() -> None:
    cfg = parse(TrainConfig)
    mesh = extract_mesh_from_checkpoint(cfg)
    # fine-tune stage is a fresh experiment: don't re-load the NeRF ckpt
    paint_cfg = dataclasses.replace(
        cfg,
        log=dataclasses.replace(cfg.log, exp_name=cfg.log.exp_name + "_mesh"),
        optim=dataclasses.replace(cfg.optim, ckpt=None, resume=False),
        render=dataclasses.replace(cfg.render, backbone="texture-mesh"))
    app = LatentPaintApp.create(paint_cfg, mesh=mesh)
    trainer = Trainer(paint_cfg, app)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
