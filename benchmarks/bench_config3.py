"""BASELINE config 3: glossy/specular Cornell variants, 512^2, 64 spp,
STRATIFIED sampling (the reference's unused specular material,
RTrace/scene.swift:76, on the tall box — scene.cornell_box_glossy).

Two workloads on the real chip:
  * variant-B path tracer, 64 spp (8x8 stratified grid), fused fwd+bwd;
  * variant-A MIS, 48 samples (16/strategy stratified grid), fused fwd+bwd
    (the glossy BRDF/VNDF branches are variant A's).
Prints ms/step and Mrays/s for each.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    sys.path.insert(0, ".")
    from gpuraytracer_tpu.intersect import potential_occluders
    from gpuraytracer_tpu.ops.pallas_mis_bwd import render_mis_fused
    from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused
    from gpuraytracer_tpu.scene import cornell_box_glossy
    from gpuraytracer_tpu.types import RenderConfig
    from gpuraytracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    W = H = 512
    ITERS = 8
    scene = jax.device_put(cornell_box_glossy(resolution=(W, H)))

    jobs = [
        ("path 64spp stratified",
         RenderConfig(width=W, height=H, integrator="path", spp=64,
                      bounces=3, sampler="stratified"),
         render_path_decoupled_fused,
         W * H * 64 * 3 * 2),
        ("mis 48samples stratified",
         RenderConfig(width=W, height=H, integrator="mis", camera_rays=6,
                      mis_samples=48, sampler="stratified"),
         render_mis_fused,
         W * H * 6 * (1 + 16 * 5)),
    ]
    for name, cfg, render_fn, trav in jobs:
        occ = potential_occluders(scene, cfg)
        vg = jax.value_and_grad(
            lambda s: jnp.mean(render_fn(s, cfg, occluders=occ)),
            allow_int=True)

        def step(s, eps):
            # Perturb BOTH light fields: variant B reads color, variant A
            # reads emitted_radiance — an unused perturbation would let XLA
            # hoist the loop-invariant render out of the timing scan.
            light = dataclasses.replace(
                s.light,
                color=s.light.color * (1.0 + eps),
                emitted_radiance=s.light.emitted_radiance * (1.0 + eps))
            l, grads = vg(dataclasses.replace(s, light=light))
            gsum = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads)
                       if hasattr(x, "dtype") and x.dtype == jnp.float32)
            return l + 0.0 * gsum

        @jax.jit
        def chain(s, l0):
            def body(l, _):
                return step(s, l * 1e-7), None
            l, _ = jax.lax.scan(body, l0, None, length=ITERS)
            return l

        l0 = jnp.float32(0.0)
        float(chain(scene, l0))
        dt = min(_t(lambda: float(chain(scene, l0)))
                 for _ in range(3)) / ITERS
        print(f"config3 {name}: fwd+bwd {dt*1e3:.1f} ms/step, "
              f"{trav/dt/1e6:.0f} Mrays/s")


if __name__ == "__main__":
    main()
