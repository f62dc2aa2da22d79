#!/usr/bin/env bash
# Smoke run (reference run_test.sh equivalent): short paint-mesh job on the
# procedural sphere with the tiny offline diffusion stack.
set -e
python -m scripts.train_latent_paint_mesh \
  --log.exp_name smoke --log.save_interval 50 \
  --render.train_grid_size 64 --render.eval_grid_size 256 \
  --optim.iters 200 --optim.mode 0 \
  --guide.text "a test pattern" --guide.shape_path sphere \
  --guide.tiny_diffusion true
