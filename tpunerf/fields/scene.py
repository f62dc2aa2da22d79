"""LatentNeRFScene — the volumetric scene representation.

The counterpart of meshrep.TexturedMeshScene for the reconstructed
`src/latent_nerf` capability (SURVEY.md §2.5): hash-grid NeRF field,
occupancy-grid state, sketch-shape SDF guidance, train/eval rendering, and
NeRF→mesh extraction. Static config here; learnable/updatable state in the
params pytree (the occupancy grid rides in params but is optimizer-frozen
and refreshed by `update_occupancy`).
"""
from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpunerf.core.views import ViewBatch
from tpunerf.fields import occupancy as occ_lib
from tpunerf.fields import volume_render as vr
from tpunerf.fields.latent_nerf import LatentNeRFConfig, LatentNeRFField
from tpunerf.fields.sketch_shape import SDFGrid, sketch_shape_loss

Params = Dict[str, Any]


@dataclasses.dataclass
class LatentNeRFScene:
    field: LatentNeRFField
    march: vr.MarchConfig
    occ_cfg: occ_lib.OccupancyGridConfig
    sdf: Optional[SDFGrid] = None
    proximal_surface: float = 0.3
    fovy: float = math.pi / 3
    dy: float = 0.0
    latent_size: int = 64
    train_grid_size: int = 64
    occ_update_interval: int = 16
    occ_warmup_steps: int = 64     # march everything until the grid is hot
    # device-mesh layout (dist.mesh.MeshLayout) — when set, every (B, P, …)
    # ray tensor in the render is sharding-constrained to (data, rays)
    layout: Optional[Any] = None

    @classmethod
    def create(cls, nerf_type: str = "latent", tiny: bool = False,
               bound: float = 1.0, num_samples: int = 128,
               num_compacted: int = 64, train_grid_size: int = 64,
               shape_path: Optional[str] = None, shape_scale: float = 0.6,
               dy: float = 0.0, proximal_surface: float = 0.3,
               sdf_resolution: int = 48,
               mlp_dtype: str = "auto") -> "LatentNeRFScene":
        fcfg = LatentNeRFConfig.tiny() if tiny else LatentNeRFConfig()
        fcfg = dataclasses.replace(
            fcfg, out_channels=4 if nerf_type == "latent" else 3, bound=bound,
            mlp_dtype=mlp_dtype)
        sdf = None
        if shape_path is not None:
            from tpunerf.meshrep import shapes as shp
            mesh = shp.load_shape(shape_path)
            mesh = mesh.normalize(target_scale=shape_scale, dy=dy)
            sdf = SDFGrid.from_mesh(np.asarray(mesh.vertices),
                                    np.asarray(mesh.faces),
                                    resolution=sdf_resolution, bound=bound)
        return cls(
            field=LatentNeRFField(fcfg),
            march=vr.MarchConfig(num_samples=num_samples,
                                 num_compacted=num_compacted, bound=bound),
            occ_cfg=occ_lib.OccupancyGridConfig(
                resolution=32 if tiny else 128, bound=bound),
            sdf=sdf, proximal_surface=proximal_surface, dy=dy,
            train_grid_size=train_grid_size)

    # ------------------------------------------------------------------ #
    def init_params(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((8, 3))
        d = jnp.ones((8, 3)) / math.sqrt(3.0)
        field_params = self.field.init(k1, x, d,
                                       method=self.field.init_all)
        params = {"field": field_params,
                  "occ_grid": occ_lib.init_occupancy(self.occ_cfg)}
        # cached cube-window bitfield (TPU only) — packing per lookup costs
        # ~0.25 ms/frame; it only changes at occupancy updates. Frozen
        # (trainable_keys excludes it); stored f32-bitcast.
        packed = occ_lib.packed_bitfield(params["occ_grid"], self.occ_cfg)
        if packed is not None:
            params["occ_packed"] = packed
        return params

    def trainable_keys(self) -> Tuple[str, ...]:
        return ("field",)

    # ------------------------------------------------------------------ #
    def _sigma_color_fn(self, field_params) -> Callable:
        def fn(x, d):
            return self.field.apply(field_params, x, d)
        return fn

    def render_views(self, params: Params, views: ViewBatch, key: jax.Array,
                     dims: Tuple[int, int], perturb: bool,
                     use_occupancy: bool, white_background: bool = False
                     ) -> Dict[str, jnp.ndarray]:
        H, W = dims
        rays = vr.generate_rays(views.theta, views.phi, views.radius, H, W,
                                fovy=self.fovy, look_at_height=self.dy,
                                bound=self.march.bound)
        layout = None
        B_in, P_in = rays.origins.shape[0], rays.origins.shape[1]
        if (self.layout is not None and B_in % self.layout.n_data == 0
                and P_in % self.layout.n_rays == 0):
            layout = self.layout
            rays = vr.Rays(*(layout.constrain_rays(x) for x in rays))
        occ_grid = params["occ_grid"] if use_occupancy else None
        res = vr.render_rays(self._sigma_color_fn(params["field"]), rays, key,
                             self.march, occ_grid=occ_grid,
                             occ_cfg=self.occ_cfg, perturb=perturb,
                             layout=layout,
                             occ_packed=params.get("occ_packed"))
        B, P, C = res.image.shape
        if white_background:
            bg = jnp.ones((B, P, C), res.image.dtype)
        else:
            bg = self.field.apply(params["field"],
                                  rays.dirs.reshape(-1, 3),
                                  method=self.field.background)
            bg = bg.reshape(B, P, C)
        image = res.image + (1.0 - res.weights_sum)[..., None] * bg
        return {
            "image": image.reshape(B, H, W, C),
            "mask": res.weights_sum.reshape(B, H, W, 1),
            "depth": res.depth.reshape(B, H, W, 1),
            "weights_sum": res.weights_sum,
            "sigmas": res.sigmas, "xyzs": res.xyzs, "valid": res.valid,
            "weights": res.weights,
        }

    def render_train(self, params: Params, views: ViewBatch, key: jax.Array,
                     step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = self.render_views(
            params, views, key, (self.train_grid_size,) * 2, perturb=True,
            use_occupancy=True)
        # regularizers
        out["sparsity_loss"] = jnp.mean(
            jnp.sqrt(out["weights_sum"] ** 2 + 0.01))    # CLIP-NeRF sparsity
        out["opacity_loss"] = jnp.mean(
            -out["weights_sum"] * jnp.log(out["weights_sum"] + 1e-5))
        if self.sdf is not None:
            out["shape_loss"] = sketch_shape_loss(
                self.sdf, out["xyzs"], out["sigmas"], out["valid"],
                self.proximal_surface)
        return out

    def render_test(self, params: Params, views: ViewBatch,
                    decode_fn: Optional[Callable], dims: Tuple[int, int]
                    ) -> Dict[str, jnp.ndarray]:
        """Eval render: latent fields render at the latent grid and decode
        through the VAE to `dims`; RGB fields render at `dims` directly."""
        key = jax.random.key(0)
        if self.field.config.out_channels == 4:
            out = self.render_views(params, views, key,
                                    (self.latent_size,) * 2, perturb=False,
                                    use_occupancy=True,
                                    white_background=True)
            assert decode_fn is not None
            rgb = decode_fn(out["image"])
            if rgb.shape[1] != dims[0]:
                # bicubic overshoots outside [0,1]; unclipped negatives used
                # to trip tensor2numpy's [-1,1] auto-rescale heuristic and
                # wash out eval frames (r5)
                rgb = jnp.clip(jax.image.resize(
                    rgb, (rgb.shape[0], *dims, 3), method="bicubic"),
                    0.0, 1.0)
            return {"image": rgb, "mask": out["mask"], "texture_map": None,
                    "depth": out["depth"]}
        out = self.render_views(params, views, key, dims, perturb=False,
                                use_occupancy=True, white_background=True)
        return {"image": jnp.clip(out["image"], 0.0, 1.0),
                "mask": out["mask"], "texture_map": None,
                "depth": out["depth"]}

    # ------------------------------------------------------------------ #
    def update_occupancy(self, params: Params, key: jax.Array) -> Params:
        """EMA occupancy refresh (torch-ngp cadence: every
        `occ_update_interval` steps)."""
        def density_fn(x):
            sigma, _ = self.field.apply(params["field"], x,
                                        method=self.field.density)
            return sigma

        new_grid = occ_lib.update(params["occ_grid"], density_fn, key,
                                  self.occ_cfg)
        out = dict(params)
        out["occ_grid"] = new_grid
        packed = occ_lib.packed_bitfield(new_grid, self.occ_cfg)
        if packed is not None:
            out["occ_packed"] = packed
        return out

    def density_grid(self, params: Params, resolution: int = 128
                     ) -> np.ndarray:
        """Dense σ grid for mesh extraction."""
        G = resolution
        ax = (np.arange(G) + 0.5) / G * 2 - 1
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel(), gz.ravel()],
                                   axis=-1) * self.march.bound,
                          jnp.float32)
        sigmas = []
        chunk = 65536
        for s in range(0, pts.shape[0], chunk):
            sig, _ = self.field.apply(params["field"], pts[s:s + chunk],
                                      method=self.field.density)
            sigmas.append(np.asarray(sig))
        return np.concatenate(sigmas).reshape(G, G, G)

    def extract_mesh(self, params: Params, resolution: int = 128,
                     iso: float = 10.0) -> Tuple[np.ndarray, np.ndarray]:
        from tpunerf.fields.marching import marching_tetrahedra
        grid = self.density_grid(params, resolution)
        return marching_tetrahedra(grid, iso, bound=self.march.bound)
