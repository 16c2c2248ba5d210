"""Decoupled shading: fast differentiable fwd+bwd rendering.

The monolithic megakernel (pallas_path.py) is the fastest *forward*, but
Pallas kernels are not differentiable by jax AD. Instead of hand-deriving a
backward kernel, the renderer is split at the discrete/continuous boundary:

  1. **Trace (Pallas, non-differentiable by construction):** the kernel
     replays the full path trace and emits, per (sample, bounce, pixel), one
     int32 *visibility record* (winning primitive id + shadow-occlusion bit)
     plus the raw random draws (NEE / cosine / jitter uv). The records are
     exactly the discrete decisions AD treats as constants anyway (argmin
     winners and boolean visibility are piecewise constant); the uv planes
     save the replay from recomputing Halton digits — the dominant cost of a
     jnp replay (u32 div/mod chains on [rays]-sized arrays).

  2. **Shade (jnp, differentiable):** radiance is recomputed from the
     records: hit distance from the recorded primitive's plane equation
     (differentiable w.r.t. geometry), NEE falloff/cos from the recomputed
     hit position, diffuse/emissive by gather — the same math as the jnp
     oracle minus all [rays, triangles] intersection work and all RNG, so
     both the shading forward and its backward touch only [rays]-sized
     arrays of pure arithmetic.

Gradients from AD over the shade pass are IDENTICAL to jax.grad of the jnp
reference renderer (asserted in tests), because the reference's gradient also
treats visibility as piecewise constant. The sample axis is processed in
vectorized chunks (scan over chunks, samples dense inside) — big fusion
bodies without a 1-sample serial scan, bounded live memory at high spp.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import sampling as smp
from ..intersect import compile_scene
from ..render import _zeros3, pixel_coords
from ..types import RenderConfig, Scene
from .pallas_path import TraceAux, _render_pallas_impl

_F32 = jnp.float32

OCC_BIT = 512  # record code = prim + 1 + OCC_BIT * occluded


def trace_records(scene: Scene, config: RenderConfig, interpret=None):
    """Run the megakernel emitting visibility records + random draws.
    Returns (hdr [H, W, 3], TraceAux). Non-differentiable — callers
    stop_gradient the scene."""
    return _render_pallas_impl(jax.lax.stop_gradient(scene), config,
                               interpret=interpret, emit_records=True)


def _sample_chunk(config: RenderConfig):
    """Largest divisor of spp not exceeding the configured chunk."""
    c = min(config.replay_sample_chunk, config.spp)
    while config.spp % c:
        c -= 1
    return c


def shade_replay(scene: Scene, aux: TraceAux,
                 config: RenderConfig) -> jnp.ndarray:
    """Differentiable radiance from trace records. Mirrors
    render._path_trace_chunk with closest-hit/any-hit replaced by record
    decode + per-primitive gathers, and all RNG replaced by the recorded
    draws. Arrays are [C, N] (C = sample chunk) for dense VPU work."""
    compiled = compile_scene(scene.triangles, lane_pad=1)
    light = scene.light
    cam = scene.camera
    px, py = pixel_coords(config)

    # Per-primitive shading constants packed into one [P, 11] table. The
    # per-ray "gather" is a one-hot matmul on the MXU: TPU element gathers
    # serialize (~1 elem/cycle) and their backward is a scatter; a one-hot
    # contraction is a dense GEMM both ways, and exact for f32 one-hot
    # (1.0 x table row reconstructs the row bit-for-bit under HIGHEST).
    P_tri = compiled.padded_size
    sp = scene.spheres
    num_sph = sp.num_spheres
    P = P_tri + num_sph
    z_tri = jnp.zeros((P_tri,), _F32)
    cols = [
        compiled.n,                                   # 0:3  tri normal
        compiled.c0[:, None],                         # 3    plane constant
        compiled.diffuse,                             # 4:7
        compiled.emissive,                            # 7:10
        compiled.is_emissive.astype(_F32)[:, None],   # 10
        jnp.zeros((P_tri, 3), _F32),                  # 11:14 sphere center
        z_tri[:, None],                               # 14   sphere radius
        z_tri[:, None],                               # 15   is_sphere
    ]
    table = jnp.concatenate(cols, axis=1)
    if num_sph:
        sph_rows = jnp.concatenate([
            jnp.zeros((num_sph, 4), _F32),
            sp.diffuse,
            sp.emissive,
            (jnp.linalg.norm(sp.emissive, axis=-1) > 0.0).astype(
                _F32)[:, None],
            sp.center,
            sp.radius[:, None],
            jnp.ones((num_sph, 1), _F32),
        ], axis=1)
        table = jnp.concatenate([table, sph_rows], axis=0)

    def gather_attrs(pc):
        onehot = (pc[..., None] == jnp.arange(P, dtype=pc.dtype)).astype(_F32)
        at = jax.lax.dot_general(
            onehot, table, (((onehot.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return (at[..., 0:3], at[..., 3], at[..., 4:7], at[..., 7:10],
                at[..., 10] > 0.5, at[..., 11:14], at[..., 14],
                at[..., 15] > 0.5)

    chunk = _sample_chunk(config)
    n_chunks = config.spp // chunk

    def rs(x):  # [spp, ...] -> [n_chunks, chunk, ...]
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    def one_chunk(lum, xs):
        code_b, nee0, nee1, cos0, cos1, jx, jy = xs  # [C, bounces?, N]
        uv = jnp.stack([jx, jy], axis=-1)
        o, d = smp.generate_camera_ray(
            cam.position, cam.direction, cam.up, config.resolution,
            cam.horizontal_fov, px[None, :], py[None, :], uv,
            config.integer_aspect)

        color = jnp.ones(o.shape, _F32)
        acc = jnp.zeros(o.shape, _F32)
        alive = jnp.ones(uv.shape[:-1], bool)

        for bounce in range(config.bounces):
            code = code_b[:, bounce]
            occ = code >= OCC_BIT
            prim = code % OCC_BIT - 1
            hit = prim >= 0
            pc = jnp.clip(prim, 0, P - 1)
            (normal, c0, diffuse, emissive, is_em, s_center, s_radius,
             is_sph) = gather_attrs(pc)

            # Hit distance from the recorded primitive's plane equation —
            # differentiable w.r.t. the triangle's vertices.
            den = smp.dot(d, normal)
            t = (c0 - smp.dot(o, normal)) / jnp.where(
                jnp.abs(den) < 1e-12, 1.0, den)

            if num_sph:
                # Sphere hit distance from the recorded sphere's quadratic
                # (same op order as intersect._sphere_candidates) —
                # differentiable w.r.t. center/radius.
                oc = o - s_center
                a = smp.dot(d, d)
                b = 2.0 * smp.dot(oc, d)
                c_ = smp.dot(oc, oc) - s_radius * s_radius
                disc = b * b - 4.0 * a * c_
                sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
                t1 = (-b - sq) / (2.0 * a)
                t2 = (-b + sq) / (2.0 * a)
                t1_ok = (t1 > 1e-3) & (t1 < 1e3)
                t_sph = jnp.where(t1_ok, t1, t2)
                t = jnp.where(is_sph, t_sph, t)
                # Sphere normal from the recomputed hit point
                # (intersect.closest_hit sphere branch).
                sel = hit & is_sph
                t_ns = jnp.where(sel, t, 0.0)
                to_hit = o + d * t_ns[..., None] - s_center
                n_sph = to_hit * jax.lax.rsqrt(
                    jnp.maximum(smp.dot(to_hit, to_hit), 1e-6))[..., None]
                normal = jnp.where(sel[..., None], n_sph, normal)

            active = alive & hit
            hit_light = active & is_em
            acc = jnp.where(hit_light[..., None], emissive, acc)
            surf = active & ~is_em

            t_safe = jnp.where(surf, t, 0.0)
            point = o + d * t_safe[..., None] + normal * 1e-3

            w = jnp.stack([nee0[:, bounce], nee1[:, bounce]], axis=-1)
            lcol, ldir, _ = smp.sample_area_light(
                light.center, light.color, light.normal, point, w,
                config.area_light_half_extent)
            lcol = lcol * smp.saturate(smp.dot(normal, ldir))[..., None]
            color = jnp.where(surf[..., None], color * diffuse, color)
            contrib = surf & ~occ
            acc = acc + jnp.where(contrib[..., None], lcol * color, 0.0)

            u = jnp.stack([cos0[:, bounce], cos1[:, bounce]], axis=-1)
            sdir = smp.align_hemisphere_with_normal(
                smp.cosine_hemisphere_y_up(u), normal)
            o = jnp.where(surf[..., None], point, o)
            d = jnp.where(surf[..., None], sdir, d)
            alive = surf

        return lum + jnp.sum(acc, axis=0), None

    xs = (rs(aux.records), rs(aux.nee_u0), rs(aux.nee_u1),
          rs(aux.cos_u0), rs(aux.cos_u1), rs(aux.jitter_x), rs(aux.jitter_y))
    lum, _ = jax.lax.scan(jax.checkpoint(one_chunk), _zeros3(px), xs)
    hdr = lum / _F32(config.spp)
    return hdr.reshape(config.height, config.width, 3)


def render_path_decoupled(scene: Scene, config: RenderConfig) -> jnp.ndarray:
    """Fast differentiable variant-B render: Pallas trace + jnp shade.
    Value matches the megakernel/oracle; gradients match jax.grad of the
    oracle."""
    _, aux = trace_records(scene, config)
    return shade_replay(scene, aux, config)
