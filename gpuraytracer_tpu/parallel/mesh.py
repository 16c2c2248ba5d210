"""Device mesh + sharded rendering (SURVEY.md §2.4).

The reference is single-device (one Metal queue, blocking waits,
renderer.swift:144); distribution here is a TPU-native design: the
*pixel/ray batch* shards across a 1-D ``rays`` mesh axis (data-parallel
analog), scene parameters stay replicated, and reductions ride XLA
collectives (``psum``) over ICI/DCN. Because all randomness is a pure
function of (pixel, sample, bounce, dim), the sharded render is
bit-identical to the single-device render — asserted in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import _path_trace_chunk, pixel_coords, pixel_rng_offsets
from ..intersect import compile_scene
from ..types import RenderConfig, Scene

RAY_AXIS = "rays"


def make_ray_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices; axis name ``rays``."""
    devices = list(devices) if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (RAY_AXIS,), devices=devices)


def render_path_sharded(scene: Scene, config: RenderConfig, mesh: Mesh):
    """Variant-B path render with pixels sharded over the ``rays`` axis and
    the scene replicated. Returns [H, W, 3] HDR (global array)."""
    n_dev = mesh.shape[RAY_AXIS]
    n_pixels = config.num_pixels
    if n_pixels % n_dev:
        raise ValueError(f"{n_pixels} pixels not divisible by {n_dev} devices")

    compiled = compile_scene(scene.triangles, config.lane_pad)
    px, py = pixel_coords(config)
    offsets = pixel_rng_offsets(config)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
    )
    def shard_render(compiled_, scene_, px_, py_, offsets_):
        return _path_trace_chunk(compiled_, scene_, config, px_, py_, offsets_)

    hdr = shard_render(compiled, scene, px, py, offsets)
    return hdr.reshape(config.height, config.width, 3)


def make_sharded_renderer(config: RenderConfig, mesh: Mesh):
    """jit-compiled sharded renderer: scene -> [H, W, 3]."""
    def fn(scene: Scene):
        return render_path_sharded(scene, config, mesh)
    return jax.jit(fn)


def psum_mean(x: jnp.ndarray, axis_name: str = RAY_AXIS) -> jnp.ndarray:
    """Mean across the mesh axis (metric reduction helper)."""
    return jax.lax.pmean(x, axis_name)
