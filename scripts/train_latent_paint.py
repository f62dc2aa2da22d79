"""CLI: latent-paint texture painting (reference scripts/train_latent_paint.py).

Usage:
    python -m scripts.train_latent_paint --config_path demo_configs/latent_paint/goldfish.yaml
    python -m scripts.train_latent_paint --log.exp_name x --guide.text "A goldfish" --guide.shape_path shapes/blub.obj
"""
from tpunerf.core.config import parse
from tpunerf.training.config import TrainConfig
from tpunerf.training.latent_paint import LatentPaintApp
from tpunerf.training.trainer import Trainer


def main() -> None:
    cfg = parse(TrainConfig)
    app = LatentPaintApp.create(cfg)
    trainer = Trainer(cfg, app)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
