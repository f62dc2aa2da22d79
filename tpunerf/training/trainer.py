"""Trainer core — one shared loop for all apps (paint / paint-mesh / nerf).

Re-designs the reference's three near-duplicate Trainer classes
(src/latent_paint/training/trainer.py:24-310, latent_paint_mesh/training/
trainer.py:31-871) around a single jitted train step: the app supplies a pure
`loss_fn(params, views, key, step)` and the trainer compiles
render → guidance → backward → optimizer-update into ONE XLA program per
step — no eager boundaries, donated buffers, PRNG-key threading.

Keeps the reference's experiment layout: `checkpoints/`, `vis/train/`,
`vis/eval/`, `results/`, config.yaml dump, periodic eval orbit + checkpoint,
5%-probability train-render dumps, final 100-pose mp4 + mesh export.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpunerf.core.views import (ViewBatch, ViewSamplerConfig, circle_poses,
                                rand_poses)
from tpunerf.training.checkpoints import CheckpointManager
from tpunerf.training.config import TrainConfig
from tpunerf.utils import make_path, seed_everything, tensor2numpy
from tpunerf.utils.logging import MetricsWriter, init_logger


def _device_memory_scalars() -> Dict[str, float]:
    """Peak/in-use device memory (MB) when the backend exposes it
    (SURVEY.md §5.5; production-shape memory headroom record for
    BASELINE.md). Empty dict on backends without memory_stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    out = {}
    if "peak_bytes_in_use" in stats:
        out["peak_mem_mb"] = round(stats["peak_bytes_in_use"] / 2 ** 20, 1)
    if "bytes_in_use" in stats:
        out["mem_mb"] = round(stats["bytes_in_use"] / 2 ** 20, 1)
    return out


class TrainableApp(Protocol):
    """What an application provides to the shared trainer."""

    def init_params(self, key: jax.Array) -> Any: ...

    def loss_fn(self, params: Any, views: ViewBatch, key: jax.Array,
                step: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, Any]]: ...

    def eval_render(self, params: Any, views: ViewBatch,
                    dims: Tuple[int, int]) -> Dict[str, jnp.ndarray]: ...

    def make_optimizer(self) -> optax.GradientTransformation: ...

    def export(self, params: Any, path: Path) -> None: ...

    def preview_latents(self, latents: jnp.ndarray) -> jnp.ndarray: ...

    def migrate_params(self, params: Any) -> Any:
        """Cross-mode checkpoint migration hook (latent→RGB)."""
        return params


class Trainer:
    def __init__(self, cfg: TrainConfig, app: TrainableApp):
        self.cfg = cfg
        self.app = app
        seed_everything(cfg.optim.seed)

        self.exp_dir = make_path(cfg.log.exp_dir)
        self.ckpt_dir = make_path(self.exp_dir / "checkpoints")
        self.train_vis_dir = make_path(self.exp_dir / "vis" / "train")
        self.eval_vis_dir = make_path(self.exp_dir / "vis" / "eval")
        self.results_dir = make_path(self.exp_dir / "results")
        self.logger = init_logger(self.exp_dir)
        self.metrics = MetricsWriter(self.exp_dir / "metrics.jsonl")

        from tpunerf.core.config import dump_yaml
        dump_yaml(cfg, self.exp_dir / "config.yaml")

        self.view_cfg = ViewSamplerConfig(
            radius_range=cfg.render.radius_range,
            theta_range=cfg.render.theta_range,
            phi_range=cfg.render.phi_range,
            angle_overhead=cfg.render.angle_overhead,
            angle_front=cfg.render.angle_front,
            body_prob=cfg.render.body_prob)

        self.key = jax.random.key(cfg.optim.seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = app.init_params(k_init)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        self.logger.info(f"Scene has {n_params} learnable parameters")

        self.tx = app.make_optimizer()
        self.opt_state = self.tx.init(self.params)
        self.train_step_idx = 0

        # device-mesh sharding across local devices (SURVEY.md §2.7/§5.7):
        # params replicated, view batch split over `data`, pixels of each
        # frame over `rays` — XLA inserts the gradient psum from the
        # sharding annotations
        self.layout = None
        n_dev = len(jax.devices())
        if n_dev > 1:
            n_rays = max(1, cfg.dist.rays_axis)
            n_data = (n_dev // n_rays if cfg.dist.data_axis == -1
                      else cfg.dist.data_axis)
            if n_data * n_rays != n_dev:
                self.logger.warning(
                    f"dist mesh ({n_data}×{n_rays}) does not tile the "
                    f"{n_dev} devices — running SINGLE-device; set "
                    f"dist.data_axis/dist.rays_axis to factor {n_dev}")
            elif cfg.render.batch_size % n_data != 0:
                self.logger.warning(
                    f"batch_size {cfg.render.batch_size} not divisible by "
                    f"the data axis ({n_data}) — running SINGLE-device; "
                    f"set render.batch_size to a multiple of {n_data} to "
                    f"enable the {n_dev}-device mesh")
            else:
                from tpunerf.dist.mesh import make_mesh
                self.layout = make_mesh(n_data=n_data, n_rays=n_rays)
                self.params = jax.device_put(self.params,
                                             self.layout.replicated())
                self.opt_state = jax.device_put(self.opt_state,
                                                self.layout.replicated())
                if hasattr(app, "set_layout"):
                    app.set_layout(self.layout)
                self.logger.info(
                    f"device mesh: data={n_data} × rays={n_rays} "
                    f"(batch {cfg.render.batch_size})")

        self.ckpts = CheckpointManager(self.ckpt_dir,
                                       max_keep=cfg.log.max_keep_ckpts)
        if cfg.optim.resume or cfg.optim.ckpt:
            self._load_checkpoint(cfg.optim.ckpt,
                                  model_only=cfg.optim.ckpt is not None)

        self._train_step = self._build_train_step()
        self._chunk_fns: Dict[int, Callable] = {}
        self._eval_fns: Dict[Tuple, Callable] = {}
        self._tracing = False
        # PNG/JPG encodes ride a small IO pool so eval-frame writes overlap
        # the next device dispatches; drained at evaluate() start/end-of-run
        import concurrent.futures
        self._io_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="imgio")
        self._io_futures: list = []

    # ------------------------------------------------------------------ #
    def _build_train_step(self):
        tx, app = self.tx, self.app
        get_refs = getattr(app, "frozen_refs", None)
        swap = getattr(app, "swap_frozen", None)

        if get_refs is not None and swap is not None:
            # Thread the app's big FROZEN params (SD UNet ≈ 3.4 GB f32)
            # through jit as ARGUMENTS: closed-over jnp arrays become HLO
            # constants, and with the full-size UNet embedded the remote
            # compile of the step program exceeded the TPU compile
            # service's ~30-min limit (reproduced twice, r4). bench.py's
            # docstring documents the same hazard. During tracing the
            # tracer refs are swapped into the guidance objects and the
            # real arrays restored before returning.
            frozen = get_refs()
            if self.layout is not None:
                frozen = jax.device_put(frozen, self.layout.replicated())
            self._frozen_refs = frozen

            @jax.jit
            def step_frozen(params, opt_state, key, views, step, refs):
                prev = swap(refs)
                try:
                    (loss, aux), grads = jax.value_and_grad(
                        app.loss_fn, has_aux=True)(params, views, key, step)
                finally:
                    swap(prev)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gnorm = optax.global_norm(grads)
                return params, opt_state, loss, gnorm, aux

            def step_fn(params, opt_state, key, views, step):
                return step_frozen(params, opt_state, key, views, step,
                                   self._frozen_refs)

            return step_fn

        @jax.jit
        def step_fn(params, opt_state, key, views, step):
            (loss, aux), grads = jax.value_and_grad(
                app.loss_fn, has_aux=True)(params, views, key, step)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            return params, opt_state, loss, gnorm, aux

        return step_fn

    def _build_train_chunk(self, k: int):
        """ONE XLA program running `k` train steps chained in a lax.scan —
        pose sampling, fwd+bwd, optimizer update, and the (traceable)
        occupancy refresh all inside the scan body. Amortizes per-dispatch
        host overhead: the r4 production run paid ~24 ms/step of tunnel
        dispatch on the eager loop vs ~28 ms of compute (BASELINE.md §3).

        PRNG threading replicates the eager loop exactly (split(key, 3)
        per step; one extra split when the app has a post-step hook), so
        chunked and eager training produce numerically equivalent parameter
        trajectories (same keys/poses/noise; XLA fusion of the scan body may
        perturb low bits) — regression-tested to 1e-5 in
        tests/test_trainer_chunk.py."""
        tx, app, cfg = self.tx, self.app, self.cfg
        get_refs = getattr(app, "frozen_refs", None)
        swap = getattr(app, "swap_frozen", None)
        post_scan = getattr(app, "post_step_in_scan", None)
        # split the post-step key whenever EITHER hook exists: apps normally
        # pair them (eager post_step + traceable post_step_in_scan, identical
        # trajectories), but an app defining only the in-scan form must not
        # have it silently skipped (r4 advisor)
        splits_post = (getattr(app, "post_step", None) is not None
                       or post_scan is not None)
        view_cfg = self.view_cfg
        batch = cfg.render.batch_size
        layout = self.layout

        def run_scan(params, opt_state, key, step0):
            def body(carry, i):
                params, opt_state, key = carry
                step = step0 + i + 1
                key, k_view, k_loss = jax.random.split(key, 3)
                views = rand_poses(k_view, batch, view_cfg)
                if layout is not None:
                    views = jax.lax.with_sharding_constraint(
                        views, layout.views())
                (loss, aux), grads = jax.value_and_grad(
                    app.loss_fn, has_aux=True)(params, views, k_loss, step)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gnorm = optax.global_norm(grads)
                if splits_post:
                    key, k_post = jax.random.split(key)
                    if post_scan is not None:
                        params = post_scan(params, step, k_post)
                return (params, opt_state, key), (loss, gnorm, aux)

            (params, opt_state, key), (losses, gnorms, auxs) = jax.lax.scan(
                body, (params, opt_state, key), jnp.arange(k))
            # only the final step's aux is consumed (train-render dumps)
            aux_last = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            return params, opt_state, key, losses, gnorms, aux_last

        if get_refs is not None and swap is not None:
            # frozen guidance params threaded as args (same hazard as
            # _build_train_step: closed-over arrays become HLO constants)
            @jax.jit
            def chunk_frozen(params, opt_state, key, step0, refs):
                prev = swap(refs)
                try:
                    return run_scan(params, opt_state, key, step0)
                finally:
                    swap(prev)

            return lambda params, opt_state, key, step0: chunk_frozen(
                params, opt_state, key, step0, self._frozen_refs)

        return jax.jit(run_scan)

    # ------------------------------------------------------------------ #
    def train(self) -> None:
        cfg = self.cfg
        from tqdm import tqdm

        self.evaluate(self.train_step_idx, size=cfg.log.eval_size)
        pbar = tqdm(total=cfg.optim.iters, initial=self.train_step_idx,
                    bar_format="{desc}: {percentage:3.0f}% training step "
                               "{n_fmt}/{total_fmt} {elapsed} "
                               "[{rate_fmt}]")
        rng = np.random.default_rng(cfg.optim.seed + 1)
        import time as _time
        # anchor the throughput clock so the FIRST metrics row is real
        # (it still includes the step compile; steady-state is row 2+)
        self._last_metric_time = _time.perf_counter()

        chunk = max(1, cfg.optim.train_chunk)
        if (chunk > 1 and getattr(self.app, "post_step", None) is not None
                and getattr(self.app, "post_step_in_scan", None) is None):
            self.logger.warning(
                "optim.train_chunk > 1 but the app's post_step has no "
                "traceable post_step_in_scan form — running eager steps")
            chunk = 1
        if chunk > 1:
            self._train_chunked(chunk, pbar, rng)
            if self._tracing:
                # out-of-range upper bound must not leave the profiler running
                jax.block_until_ready(self.params)
                jax.profiler.stop_trace()
                self._tracing = False
                self.logger.info(f"profiler trace written to "
                                 f"{self.exp_dir / 'trace'}")
            pbar.close()
            self.logger.info("Finished Training ^_^")
            self.logger.info("Evaluating the last model...")
            self.full_eval()
            self.ckpts.flush()
            self._drain_io()
            self.logger.info("\tDone!")
            return

        tracing = False
        while self.train_step_idx < cfg.optim.iters:
            self.train_step_idx += 1
            self.key, k_view, k_loss = jax.random.split(self.key, 3)
            views = rand_poses(k_view, cfg.render.batch_size, self.view_cfg)
            if self.layout is not None:
                views = jax.device_put(views, self.layout.views())
            # trace captures steps [a, b): start before executing a, stop
            # before executing b
            if (cfg.log.trace_steps and not tracing
                    and self.train_step_idx == cfg.log.trace_steps[0]):
                jax.profiler.start_trace(str(self.exp_dir / "trace"))
                tracing = True
            elif tracing and self.train_step_idx >= cfg.log.trace_steps[1]:
                jax.profiler.stop_trace()
                tracing = False
                self.logger.info(f"profiler trace written to "
                                 f"{self.exp_dir / 'trace'}")
            # kept so a non-finite step can checkpoint the LAST GOOD params
            # (the step's update has already been applied to self.params);
            # buffers are not donated, so this alias is free
            prev_params = self.params if cfg.optim.check_nan else None
            self.params, self.opt_state, loss, gnorm, aux = self._train_step(
                self.params, self.opt_state, k_loss, views,
                jnp.asarray(self.train_step_idx))
            if cfg.optim.check_nan and not np.isfinite(float(loss)):
                # pre-update params, under a name outside rolling retention —
                # a poisoned step_*.ckpt could evict the last good checkpoint
                # and then be what --optim.resume loads
                path = self.ckpts.save_debug(
                    "nan_debug", self.train_step_idx - 1, prev_params,
                    is_main_process=jax.process_index() == 0)
                if tracing:
                    jax.profiler.stop_trace()
                raise FloatingPointError(
                    f"non-finite loss at step {self.train_step_idx} "
                    f"(last-good params saved to {path})")
            post = getattr(self.app, "post_step", None)
            if post is not None:
                self.key, k_post = jax.random.split(self.key)
                self.params = post(self.params, self.train_step_idx, k_post)
            pbar.update(1)

            if self.train_step_idx % 50 == 0:
                jax.block_until_ready(loss)
                now = _time.perf_counter()
                dt = now - self._last_metric_time
                self._last_metric_time = now
                steps = 50 if dt > 0 else 1
                loss_f, gnorm_f = float(loss), float(gnorm)
                pbar.set_description(f"loss {loss_f:+.3e} |g| {gnorm_f:.3e}")
                self.metrics.write(
                    self.train_step_idx, loss=loss_f, grad_norm=gnorm_f,
                    steps_per_s=(steps / dt) if dt > 0 else 0.0,
                    rays_per_s=(steps * cfg.render.batch_size *
                                cfg.render.train_grid_size ** 2 / dt)
                    if dt > 0 else 0.0,
                    **self._app_metric_scalars(),
                    **_device_memory_scalars())

            if self.train_step_idx % cfg.log.save_interval == 0:
                self.save_checkpoint(full=True)
                self.evaluate(self.train_step_idx, size=cfg.log.eval_size)

            if (cfg.log.log_images and "image" in aux
                    and rng.random() < cfg.log.vis_train_prob):
                self._log_train_render(aux)
        if tracing:
            # out-of-range upper bound must not leave the profiler running
            jax.block_until_ready(self.params)
            jax.profiler.stop_trace()
            self.logger.info(f"profiler trace written to "
                             f"{self.exp_dir / 'trace'}")
        pbar.close()
        self.logger.info("Finished Training ^_^")
        self.logger.info("Evaluating the last model...")
        self.full_eval()
        self.ckpts.flush()
        self._drain_io()
        self.logger.info("\tDone!")

    # ------------------------------------------------------------------ #
    def _train_chunked(self, chunk: int, pbar, rng) -> None:
        """Chunked loop: dispatch `chunk` steps per device call (clipped at
        the next save_interval boundary and at optim.iters so the eval/
        checkpoint cadence is identical to the eager loop). Profiler traces
        and vis-train dump draws happen at chunk granularity."""
        cfg = self.cfg
        import time as _time
        last_metric_step = self.train_step_idx
        while self.train_step_idx < cfg.optim.iters:
            nxt = ((self.train_step_idx // cfg.log.save_interval) + 1
                   ) * cfg.log.save_interval
            k = min(chunk, cfg.optim.iters - self.train_step_idx,
                    nxt - self.train_step_idx)
            fn = self._chunk_fns.get(k)
            if fn is None:
                fn = self._chunk_fns[k] = self._build_train_chunk(k)
            ts = cfg.log.trace_steps
            if (ts and not self._tracing
                    and self.train_step_idx < ts[0] <= self.train_step_idx + k):
                jax.profiler.start_trace(str(self.exp_dir / "trace"))
                self._tracing = True
            prev_params = self.params if cfg.optim.check_nan else None
            step0 = self.train_step_idx
            (self.params, self.opt_state, self.key, losses, gnorms,
             aux) = fn(self.params, self.opt_state, self.key,
                       jnp.asarray(step0))
            self.train_step_idx += k
            if self._tracing and self.train_step_idx >= ts[1]:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
                self._tracing = False
                self.logger.info(f"profiler trace written to "
                                 f"{self.exp_dir / 'trace'}")
            if cfg.optim.check_nan:
                ls = np.asarray(losses)
                if not np.isfinite(ls).all():
                    bad = step0 + 1 + int(np.argmax(~np.isfinite(ls)))
                    path = self.ckpts.save_debug(
                        "nan_debug", step0, prev_params,
                        is_main_process=jax.process_index() == 0)
                    if self._tracing:
                        jax.profiler.stop_trace()
                    raise FloatingPointError(
                        f"non-finite loss at step {bad} (chunk-start params "
                        f"saved to {path}; rerun with --optim.train_chunk 1 "
                        f"to localize with step-granular last-good params)")
            pbar.update(k)

            if self.train_step_idx // 50 > last_metric_step // 50:
                jax.block_until_ready(losses)
                now = _time.perf_counter()
                dt = now - self._last_metric_time
                self._last_metric_time = now
                steps = self.train_step_idx - last_metric_step
                last_metric_step = self.train_step_idx
                loss_f = float(losses[-1])
                gnorm_f = float(gnorms[-1])
                pbar.set_description(f"loss {loss_f:+.3e} |g| {gnorm_f:.3e}")
                self.metrics.write(
                    self.train_step_idx, loss=loss_f, grad_norm=gnorm_f,
                    steps_per_s=(steps / dt) if dt > 0 else 0.0,
                    rays_per_s=(steps * cfg.render.batch_size *
                                cfg.render.train_grid_size ** 2 / dt)
                    if dt > 0 else 0.0,
                    **self._app_metric_scalars(),
                    **_device_memory_scalars())

            if self.train_step_idx % cfg.log.save_interval == 0:
                self.save_checkpoint(full=True)
                self.evaluate(self.train_step_idx, size=cfg.log.eval_size)

            if (cfg.log.log_images and "image" in aux
                    and rng.random() < cfg.log.vis_train_prob):
                self._log_train_render(aux)

    # ------------------------------------------------------------------ #
    def _drain_io(self) -> None:
        """Wait for queued image writes; surface the first failure."""
        futures, self._io_futures = self._io_futures, []
        for f in futures:
            f.result()

    def _app_metric_scalars(self) -> Dict[str, float]:
        """App-specific metric-row scalars (e.g. the latent-nerf app's
        occupied grid fraction). One small host fetch per 50 steps."""
        hook = getattr(self.app, "metric_scalars", None)
        return hook(self.params) if hook is not None else {}

    def _build_eval_fn(self, dims: Tuple[int, int]) -> Callable:
        """One jitted render for a CHUNK of eval poses. The r4 production
        run spent ~2/3 of wall clock in the eval orbit because eval_render
        ran eagerly one pose at a time — every jnp op paid the tunnel's
        per-dispatch overhead. Jitting collapses each chunk to one dispatch
        and batches the render + VAE decode over `log.eval_batch` poses;
        frozen guidance params thread through as jit arguments (same
        HLO-constant hazard as the train step)."""
        app = self.app
        get_refs = getattr(app, "frozen_refs", None)
        swap = getattr(app, "swap_frozen", None)

        def render(params, views):
            out = dict(app.eval_render(params, views, dims))
            # quantize to uint8 IN-JIT: the tunnel moves ~13 MB/s, so
            # fetching 512² orbit frames as f32 cost ~2.4 s per 10-pose
            # eval (measured r5); uint8 is 4× less. Exactly the
            # tensor2numpy convention: clip [0,1] then truncate.
            img = jnp.clip(out.pop("image"), 0.0, 1.0)
            out["image_u8"] = (img * 255).astype(jnp.uint8)
            return out

        if get_refs is not None and swap is not None:
            @jax.jit
            def eval_frozen(params, views, refs):
                prev = swap(refs)
                try:
                    return render(params, views)
                finally:
                    swap(prev)

            return lambda params, views: eval_frozen(params, views,
                                                     self._frozen_refs)
        return jax.jit(render)

    def evaluate(self, step: int, size: int,
                 save_as_video: bool = False,
                 out_dir: Optional[Path] = None) -> None:
        """Render + save the eval orbit. Frame PNG writes are ASYNC (they
        overlap the next training block) — call `_drain_io()` to wait for
        them; the train loop drains at the next evaluate()/run end, and
        the IO pool's non-daemon threads guarantee completion before
        process exit either way."""
        cfg = self.cfg
        out_dir = out_dir or self.eval_vis_dir
        views = circle_poses(size, self.view_cfg)
        frames = []
        dims = (cfg.render.eval_grid_size, cfg.render.eval_grid_size)
        chunk = max(1, min(size, cfg.log.eval_batch))
        # app-declared memory cap: e.g. the RGB-mode volumetric field
        # renders every eval pixel (512²×S samples/pose ≈ 33M points) —
        # batching 5 poses OOMs the 16 GB chip (r5 refine-stage run)
        cap = getattr(self.app, "max_eval_batch", None)
        if cap is not None:
            chunk = max(1, min(chunk, cap(dims)))
        fn = self._eval_fns.get((dims, chunk))
        if fn is None:
            fn = self._eval_fns[(dims, chunk)] = self._build_eval_fn(dims)
        self._drain_io()
        for s in range(0, size, chunk):
            # pad the tail chunk by repeating the last pose: every call has
            # the same batch shape → exactly one compile per (dims, chunk)
            idx = np.minimum(np.arange(s, s + chunk), size - 1)
            v = jax.tree_util.tree_map(lambda x: x[idx], views)
            out = fn(self.params, v)
            n_valid = min(chunk, size - s)
            img = np.asarray(out["image_u8"][:n_valid])
            frames.extend(img[i] for i in range(n_valid))
            if (s == 0 and out.get("texture_map", None) is not None):
                self._save_image(out_dir / f"step_{step:06d}_texture.png",
                                 tensor2numpy(np.asarray(
                                     out["texture_map"][0])))
        if save_as_video:
            # mp4 → gif → pngs, first available (video-encode failures are
            # non-fatal, reference trainer.py:177-180)
            try:
                import imageio
                imageio.mimwrite(self.results_dir /
                                 f"step_{step:06d}_rgb.mp4", frames, fps=25)
            except Exception:
                try:
                    import imageio
                    imageio.mimwrite(
                        self.results_dir / f"step_{step:06d}_rgb.gif",
                        frames, duration=40, loop=0)
                except Exception as e:
                    self.logger.warning(
                        f"video encode failed ({e}); saving pngs")
                    for i, f in enumerate(frames):
                        self._save_image(
                            out_dir / f"step_{step:06d}_{i:03d}_rgb.png", f)
        else:
            for i, f in enumerate(frames):
                self._io_futures.append(self._io_pool.submit(
                    self._save_image,
                    out_dir / f"step_{step:06d}_{i:03d}_rgb.png", f))

    def full_eval(self) -> None:
        cfg = self.cfg
        self.evaluate(self.train_step_idx, size=cfg.log.full_eval_size,
                      save_as_video=True, out_dir=self.results_dir)
        if cfg.log.save_mesh:
            try:
                export_dir = make_path(self.exp_dir / "mesh")
                self.app.export(self.params, export_dir)
                self.logger.info(f"mesh exported to {export_dir}")
            except NotImplementedError as e:
                self.logger.info(f"mesh export skipped: {e}")

    # ------------------------------------------------------------------ #
    def _log_train_render(self, aux: Dict[str, Any]) -> None:
        img = aux["image"]
        if img.shape[-1] == 4:  # latent → preview decode
            img = self.app.preview_latents(img)
        self._save_image(
            self.train_vis_dir / f"step_{self.train_step_idx:06d}.jpg",
            tensor2numpy(np.asarray(img[0])))

    @staticmethod
    def _save_image(path: Path, img: np.ndarray) -> None:
        from PIL import Image
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        Image.fromarray(img).save(path)

    # ------------------------------------------------------------------ #
    def save_checkpoint(self, full: bool = True) -> None:
        is_main = jax.process_index() == 0
        self.ckpts.save(self.train_step_idx, self.params, self.opt_state,
                        full=full, is_main_process=is_main,
                        async_write=self.cfg.log.async_ckpt)

    def _load_checkpoint(self, path: Optional[Path], model_only: bool) -> None:
        params, opt_state, next_step = self.ckpts.load(
            path, params_template=self.params,
            opt_state_template=None if model_only else self.opt_state)
        if params is None:
            self.logger.info("No checkpoint found, starting from scratch")
            return
        params = self.app.migrate_params(params)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        if not model_only:
            # the loop is increment-then-run: restoring to the SAVED step
            # makes the next executed step `saved + 1` (next_step would skip
            # one step — regression-tested in tests/test_dist.py)
            self.train_step_idx = next_step - 1
            if opt_state is not None:
                self.opt_state = opt_state
        if self.layout is not None:
            # restore the replicated placement — a plain asarray load lands
            # on the default device and would silently single-device the
            # data-parallel step
            self.params = jax.device_put(self.params,
                                         self.layout.replicated())
            self.opt_state = jax.device_put(self.opt_state,
                                            self.layout.replicated())
        if jax.process_count() > 1:
            # multihost barrier at restore (SURVEY.md §5.3) — every process
            # must finish reading before any starts mutating checkpoints
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("tpunerf_restore")
        self.logger.info(
            f"Restored checkpoint (step {next_step - 1}, "
            f"model_only={model_only})")
