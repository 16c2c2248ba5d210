"""Decoupled shading: fast differentiable fwd+bwd rendering.

The monolithic megakernel (pallas_path.py) is the fastest *forward*, but
Pallas kernels are not differentiable by jax AD. Instead of hand-deriving a
backward kernel, the renderer is split at the discrete/continuous boundary:

  1. **Trace (Pallas, non-differentiable by construction):** the kernel
     replays the full path trace and emits one int32 *visibility record* per
     (sample, bounce, pixel): winning primitive id + shadow-occlusion bit.
     These are exactly the discrete decisions AD treats as constants anyway
     (argmin winners and boolean visibility are piecewise constant).

  2. **Shade (jnp, differentiable):** radiance is recomputed from the
     records: hit distance from the recorded primitive's plane equation
     (differentiable w.r.t. geometry), NEE falloff/cos from the recomputed
     hit position, diffuse/emissive by gather — the same math as the jnp
     oracle minus all [rays, triangles] intersection work, so both the
     shading forward and its backward touch only [rays]-sized arrays.

Gradients from AD over the shade pass are IDENTICAL to jax.grad of the jnp
reference renderer (asserted in tests), because the reference's gradient also
treats visibility as piecewise constant. fwd+bwd cost ~= one kernel launch +
a bandwidth-light jnp pass instead of the oracle's HBM-bound recompute.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import sampling as smp
from ..intersect import compile_scene
from ..render import _zeros3, pixel_coords, pixel_rng_offsets
from ..types import RenderConfig, Scene
from .pallas_path import _render_pallas_impl

_F32 = jnp.float32

OCC_BIT = 512  # record code = prim + 1 + OCC_BIT * occluded


def trace_records(scene: Scene, config: RenderConfig, interpret=None):
    """Run the megakernel emitting visibility records. Returns
    (hdr [H, W, 3], records [spp, bounces, N] int32). Non-differentiable —
    callers stop_gradient the scene."""
    return _render_pallas_impl(jax.lax.stop_gradient(scene), config,
                               interpret=interpret, emit_records=True)


def shade_replay(scene: Scene, records: jnp.ndarray,
                 config: RenderConfig) -> jnp.ndarray:
    """Differentiable radiance from visibility records. Mirrors
    render._path_trace_chunk with closest-hit/any-hit replaced by record
    decode + per-primitive gathers."""
    compiled = compile_scene(scene.triangles, lane_pad=1)
    light = scene.light
    cam = scene.camera
    px, py = pixel_coords(config)
    offsets = pixel_rng_offsets(config)

    gather = lambda arr, idx: jnp.take(arr, idx, axis=0)

    def one_sample(lum, xs):
        n, code_b = xs  # scalar uint32, [bounces, N] int32
        i_halton = offsets + n
        uv = jnp.stack([smp.halton(i_halton, 0), smp.halton(i_halton, 1)],
                       axis=-1)
        o, d = smp.generate_camera_ray(
            cam.position, cam.direction, cam.up, config.resolution,
            cam.horizontal_fov, px, py, uv, config.integer_aspect)

        color = jnp.ones(o.shape, _F32)
        acc = jnp.zeros(o.shape, _F32)
        alive = jnp.ones(px.shape, bool)

        for bounce in range(config.bounces):
            code = code_b[bounce]
            occ = code >= OCC_BIT
            prim = code % OCC_BIT - 1
            hit = prim >= 0
            pc = jnp.clip(prim, 0, compiled.padded_size - 1)

            normal = gather(compiled.n, pc)
            c0 = gather(compiled.c0, pc)
            diffuse = gather(compiled.diffuse, pc)
            emissive = gather(compiled.emissive, pc)
            is_em = gather(compiled.is_emissive, pc)

            # Hit distance from the recorded primitive's plane equation —
            # differentiable w.r.t. the triangle's vertices.
            den = smp.dot(d, normal)
            t = (c0 - smp.dot(o, normal)) / jnp.where(
                jnp.abs(den) < 1e-12, 1.0, den)

            active = alive & hit
            hit_light = active & is_em
            acc = jnp.where(hit_light[..., None], emissive, acc)
            surf = active & ~is_em

            t_safe = jnp.where(surf, t, 0.0)
            point = o + d * t_safe[..., None] + normal * 1e-3

            w = jnp.stack(
                [smp.halton(i_halton, 2 + bounce * 5 + 0),
                 smp.halton(i_halton, 2 + bounce * 5 + 1)], axis=-1)
            lcol, ldir, _ = smp.sample_area_light(
                light.center, light.color, light.normal, point, w,
                config.area_light_half_extent)
            lcol = lcol * smp.saturate(smp.dot(normal, ldir))[..., None]
            color = jnp.where(surf[..., None], color * diffuse, color)
            contrib = surf & ~occ
            acc = acc + jnp.where(contrib[..., None], lcol * color, 0.0)

            u = jnp.stack(
                [smp.halton(i_halton, 2 + bounce * 5 + 2),
                 smp.halton(i_halton, 2 + bounce * 5 + 3)], axis=-1)
            sdir = smp.align_hemisphere_with_normal(
                smp.cosine_hemisphere_y_up(u), normal)
            o = jnp.where(surf[..., None], point, o)
            d = jnp.where(surf[..., None], sdir, d)
            alive = surf

        return lum + acc, None

    lum, _ = jax.lax.scan(
        jax.checkpoint(one_sample), _zeros3(px),
        (jnp.arange(config.spp, dtype=jnp.uint32), records))
    hdr = lum / _F32(config.spp)
    return hdr.reshape(config.height, config.width, 3)


def render_path_decoupled(scene: Scene, config: RenderConfig) -> jnp.ndarray:
    """Fast differentiable variant-B render: Pallas trace + jnp shade.
    Value matches the megakernel/oracle; gradients match jax.grad of the
    oracle."""
    _, records = trace_records(scene, config)
    return shade_replay(scene, records, config)
