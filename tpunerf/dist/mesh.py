"""Device-mesh distribution layer: (data, rays) axes over pjit/shard_map.

The reference has NO distribution (SURVEY.md §2.7: single GPU, no NCCL/MPI).
This layer is the TPU-native capability the new framework adds, designed per
SURVEY.md §2.7/§5.7/§5.8:

* `data` axis — camera views/batches sharded across hosts/chips (view
  sampling is synthetic PRNG, so "data loading" shards by folding the
  host id into the key — core/views.train_view_stream);
* `rays` axis — pixels of each frame sharded within a host; compositing is
  ray-local so this axis needs **zero** cross-chip traffic;
* parameters (hash table, texture, MLPs, UNet) replicated; XLA inserts the
  gradient all-reduce (psum) from the sharding annotations, riding ICI.

No hand-written communication backend: collectives are lowered by XLA from
`NamedSharding` annotations, multi-host init is `jax.distributed.initialize`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshLayout:
    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_rays(self) -> int:
        return self.mesh.shape["rays"]

    # ---- shardings ----
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def views(self) -> NamedSharding:
        """ViewBatch leaves (B,) → shard over data."""
        return NamedSharding(self.mesh, P("data"))

    def images(self) -> NamedSharding:
        """(B, H, W, C) frames → batch over data, rows over rays."""
        return NamedSharding(self.mesh, P("data", "rays"))

    def rays(self) -> NamedSharding:
        """(B, P, ...) flat ray tensors → batch over data, rays over rays."""
        return NamedSharding(self.mesh, P("data", "rays"))

    def constrain_rays(self, x):
        """Pin a (B, P, …) ray tensor — or a (B, H, …) image whose rows are
        the ray axis — to (data, rays); trailing dims replicated."""
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P("data", "rays")))

    # same (data, rays) constraint; one implementation so the two call
    # sites cannot drift (ADVICE r2)
    constrain_image = constrain_rays

    def constrain_flat(self, x):
        """Pin a flattened (B·P·K, …) sample tensor: the leading dim is the
        merged (data, rays) axis — the field MLP batch is sharded over every
        chip with zero cross-chip traffic (compositing is ray-local,
        SURVEY.md §5.7)."""
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(("data", "rays"))))


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              n_data: Optional[int] = None,
              n_rays: int = 1) -> MeshLayout:
    """Build the (data, rays) mesh. Default: all devices on `data`."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n_data is None:
        n_data = n // n_rays
    assert n_data * n_rays == n, (n_data, n_rays, n)
    arr = np.array(devices).reshape(n_data, n_rays)
    return MeshLayout(mesh=Mesh(arr, ("data", "rays")))


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY.md §5.8). No-op on single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def shard_params_replicated(params: Any, layout: MeshLayout) -> Any:
    return jax.device_put(params, layout.replicated())


def shard_views(views: Any, layout: MeshLayout) -> Any:
    return jax.device_put(views, layout.views())
