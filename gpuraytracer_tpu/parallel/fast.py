"""Multi-chip rendering on the FAST kernel paths.

parallel/mesh.py shards the jnp oracle renderer; this module shards the
Pallas megakernel + hand-written backward instead, so a pod renders at
per-chip kernel speed (~1000 Mrays/s fwd+bwd on v5e) with the usual recipe:
pixels sharded over the ``rays`` mesh axis, scene replicated, parameter
gradients all-reduced by shard_map's transpose (a psum over ``rays`` that
XLA lowers onto ICI).

Correctness hinges on the kernels' RNG being a pure function of the GLOBAL
pixel id (SURVEY.md §7): each shard passes its first pixel id (``rid_base``)
into the kernel, so the sharded image is bit-identical to the single-chip
one per pixel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.pallas_path import TILE
from ..ops.pallas_shade import render_path_fused_local
from ..render import pixel_rng_offsets
from ..types import RenderConfig, Scene
from .mesh import RAY_AXIS


def render_path_fused_sharded(scene: Scene, config: RenderConfig, mesh,
                              interpret=None) -> jnp.ndarray:
    """Differentiable variant-B render, pixels sharded over ``rays``, on the
    trace kernel + hand-written backward. Returns the global [H, W, 3] hdr.

    Requires num_pixels to split into whole ray tiles per device
    (num_pixels % (n_devices * TILE) == 0, TILE = 4096)."""
    n_dev = mesh.shape[RAY_AXIS]
    n_pixels = config.num_pixels
    if n_pixels % (n_dev * TILE):
        raise ValueError(
            f"{n_pixels} pixels must split into whole {TILE}-ray tiles "
            f"across {n_dev} devices")
    local = n_pixels // n_dev
    offsets = pixel_rng_offsets(config)
    # Auto axis type: Explicit meshes demand a global jax.set_mesh context
    # (illegal under an outer jit/grad trace); Auto keeps sharding decisions
    # inside this function.
    mesh = jax.make_mesh((n_dev,), (RAY_AXIS,),
                         devices=list(mesh.devices.flat),
                         axis_types=(jax.sharding.AxisType.Auto,))

    # check_vma=False: pallas_call outputs carry no varying-manual-axes
    # annotation, which the checker (on by default) rejects; every output
    # here is genuinely shard-varying via the offsets/rid_base inputs.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(RAY_AXIS)), out_specs=P(RAY_AXIS),
             check_vma=False)
    def run(scene_, offsets_):
        k = jax.lax.axis_index(RAY_AXIS)
        rid_base = (k * local).astype(jnp.int32).reshape(1, 1)
        return render_path_fused_local(scene_, config, offsets_, rid_base,
                                       interpret=interpret)

    # Under jit + an active mesh context the partitioner stitches the
    # pallas_call outputs' shard layouts; eager shard_map trips over the
    # kernel's unannotated (GSPMD replicated) result sharding.
    hdr = jax.jit(run)(scene, offsets)
    return hdr.reshape(config.height, config.width, 3)
