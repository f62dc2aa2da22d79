"""CLI: latent-paint-mesh (reference scripts/train_latent_paint_mesh.py).

Usage:
    python -m scripts.train_latent_paint_mesh --guide.text "..." \
        --guide.shape_path mesh.obj --optim.mode 0
"""
from tpunerf.core.config import parse
from tpunerf.training.config import TrainConfig
from tpunerf.training.latent_paint_mesh import LatentPaintMeshApp
from tpunerf.training.trainer import Trainer


def main() -> None:
    cfg = parse(TrainConfig)
    app = LatentPaintMeshApp.create(cfg)
    trainer = Trainer(cfg, app)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
