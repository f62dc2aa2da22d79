"""CLI: volumetric latent-NeRF text-to-3D
(reference scripts/train_latent_nerf.py — the broken-import entry point this
framework reconstructs; SURVEY.md §2.5).

Usage:
    python -m scripts.train_latent_nerf --config_path demo_configs/latent_nerf/sand_castle.yaml
    python -m scripts.train_latent_nerf --log.exp_name lego --guide.text "a lego man" --guide.shape_path shapes/teddy.obj
"""
from tpunerf.core.config import parse
from tpunerf.training.config import TrainConfig
from tpunerf.training.latent_nerf_app import LatentNeRFApp
from tpunerf.training.trainer import Trainer


def main() -> None:
    cfg = parse(TrainConfig)
    cfg.render.backbone = "latent-nerf"
    app = LatentNeRFApp.create(cfg)
    trainer = Trainer(cfg, app)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
