"""Edge-aware differentiable direct-lighting renderer.

Naive AD through a path tracer yields *interior* gradients only: the
visibility/closest-hit selection is a step function, so moving a sphere never
changes which pixels it covers as far as AD can see — and pure-translation
recovery (BASELINE config 4) diverges. This module adds the missing
*silhouette* term for sphere geometry with a forward-exact / backward-soft
estimator (the soft-rasterizer trick adapted to ray tracing):

  alpha_hard = [sphere is the closest hit]                (exact, forward)
  h          = perpendicular distance of the ray to the sphere center
  alpha_soft = sigmoid((r - h) / (kappa * r))             (smooth in center/r)
  alpha      = alpha_hard + alpha_soft - stop_grad(alpha_soft)

``alpha`` *evaluates* to the exact hard visibility but *differentiates* like
the smooth coverage, so d(loss)/d(center) includes the boundary term. The
pixel radiance is composited L = alpha * L_sphere + (1 - alpha) * L_background
where L_background is the triangle-only shading of the same ray — available
for free since triangles and spheres are intersected separately.

Scope: primary visibility of spheres under direct lighting (the config-4
workload: "recover sphere albedo + light emission + sphere centers"). Shadow
rays stay hard (their boundary term is second-order here); triangle
silhouettes stay hard (config 4 optimizes spheres, not walls).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from .. import sampling as smp
from ..intersect import (RAY_TMAX, RAY_TMIN, _sphere_candidates, any_hit,
                         closest_hit, compile_scene)
from ..render import _zeros3, pixel_coords, pixel_rng_offsets
from ..types import RenderConfig, Scene

_F32 = jnp.float32


def _shade_direct(compiled, scene, config, o, d, t, normal, diffuse, active,
                  i_halton, bounce=0, spheres=None):
    """Variant-B style NEE at a hit point (raytrace.metal:66-89): sample the
    area light, cos term, diffuse throughput, hard shadow ray."""
    light = scene.light
    t_safe = jnp.where(active, t, 0.0)
    point = o + d * t_safe[..., None] + normal * 1e-3
    w = jnp.stack([smp.halton(i_halton, 2 + bounce * 5 + 0),
                   smp.halton(i_halton, 2 + bounce * 5 + 1)], axis=-1)
    lcol, ldir, ldist = smp.sample_area_light(
        light.center, light.color, light.normal, point, w,
        config.area_light_half_extent)
    lcol = lcol * smp.saturate(smp.dot(normal, ldir))[..., None]
    occluded = any_hit(compiled, point, ldir, 0.0, ldist - 1e-3, spheres)
    vis = (~occluded).astype(_F32)
    return lcol * diffuse * vis[..., None]


def render_direct_soft(
    scene: Scene, config: RenderConfig, kappa: float = 0.05
) -> jnp.ndarray:
    """Direct-lighting render whose value equals the hard render but whose
    gradients include sphere-silhouette terms. Returns [H, W, 3] HDR."""
    compiled = compile_scene(scene.triangles, config.lane_pad)
    spheres = scene.spheres
    assert spheres.num_spheres > 0, "soft renderer requires sphere geometry"
    px, py = pixel_coords(config)
    offsets = pixel_rng_offsets(config)
    cam = scene.camera

    def one_sample(lum, n):
        i_halton = offsets + n
        uv = jnp.stack([smp.halton(i_halton, 0), smp.halton(i_halton, 1)],
                       axis=-1)
        o, d = smp.generate_camera_ray(
            cam.position, cam.direction, cam.up, config.resolution,
            cam.horizontal_fov, px, py, uv, config.integer_aspect)

        # Triangle-only closest hit: the background layer.
        ht = closest_hit(compiled, o, d, RAY_TMIN, RAY_TMAX, None)
        # Sphere candidates: winning sphere + its geometry.
        t_s_all, valid_s = _sphere_candidates(spheres, o, d, RAY_TMIN, RAY_TMAX)
        t_s_masked = jnp.where(valid_s, t_s_all, 1e30)
        s_idx = jnp.argmin(t_s_masked, axis=-1)
        s_hit = jnp.take_along_axis(valid_s, s_idx[..., None], -1)[..., 0]
        t_s = jnp.take_along_axis(t_s_all, s_idx[..., None], -1)[..., 0]

        center = jnp.take(spheres.center, s_idx, axis=0)
        radius = jnp.take(spheres.radius, s_idx, axis=0)
        s_diffuse = jnp.take(spheres.diffuse, s_idx, axis=0)
        s_emissive = jnp.take(spheres.emissive, s_idx, axis=0)

        sphere_front = s_hit & (t_s < ht.t)

        # Perpendicular ray-center distance -> smooth coverage. Gate the soft
        # gradient to spheres whose closest approach is actually in front of
        # the background (an occluded sphere has no silhouette to move).
        oc = center - o
        t_ca = smp.dot(oc, d)  # d normalized
        h2 = jnp.maximum(smp.dot(oc, oc) - t_ca * t_ca, 1e-12)
        h = jnp.sqrt(h2)
        potential = (t_ca > RAY_TMIN) & (t_ca < ht.t)
        alpha_soft = jax.nn.sigmoid((radius - h) / (kappa * radius))
        alpha_soft = jnp.where(potential, alpha_soft, 0.0)
        alpha = (sphere_front.astype(_F32)
                 + alpha_soft - jax.lax.stop_gradient(alpha_soft))

        # Sphere layer shading (finite on all lanes).
        t_s_safe = jnp.where(sphere_front, t_s, 1.0)
        p_s = o + d * t_s_safe[..., None]
        n_s = (p_s - center) * jax.lax.rsqrt(
            jnp.maximum(smp.dot(p_s - center, p_s - center), 1e-6))[..., None]
        L_s = _shade_direct(compiled, scene, config, o, d, t_s_safe, n_s,
                            s_diffuse, sphere_front, i_halton, spheres=spheres)
        L_s = L_s + s_emissive

        # Background (triangle) layer: emissive hit shows emission, surface
        # hit gets NEE, miss is black.
        tri_surf = ht.hit & ~ht.is_emissive
        L_t = _shade_direct(compiled, scene, config, o, d, ht.t, ht.normal,
                            ht.diffuse, tri_surf, i_halton, spheres=spheres)
        L_t = jnp.where(tri_surf[..., None], L_t, 0.0)
        L_t = jnp.where((ht.hit & ht.is_emissive)[..., None], ht.emissive, L_t)

        L = alpha[..., None] * L_s + (1.0 - alpha[..., None]) * L_t
        return lum + L, None

    lum, _ = jax.lax.scan(jax.checkpoint(one_sample), _zeros3(px),
                          jnp.arange(config.spp, dtype=jnp.uint32))
    return (lum / _F32(config.spp)).reshape(config.height, config.width, 3)
