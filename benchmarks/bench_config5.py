"""BASELINE config 5 single-chip feasibility: 1024^2, 256 spp, 3 bounces,
fused trace + Pallas backward in records_only mode (int32 records are the
only aux stream: ~3.2 GB; the f32 draw planes it replaces would be ~18 GB).
Prints time per fwd+bwd step and Mrays/s."""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from gpuraytracer_tpu.intersect import potential_occluders
    from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig
    from gpuraytracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    W = H = 1024
    SPP, B = 256, 3
    cfg = RenderConfig(width=W, height=H, integrator="path", spp=SPP,
                       bounces=B)
    scene = jax.device_put(cornell_box(resolution=(W, H)))
    occ = potential_occluders(scene, cfg)

    def loss(s):
        return jnp.mean(render_path_decoupled_fused(s, cfg, occluders=occ))

    vg = jax.value_and_grad(loss, allow_int=True)

    def step(s, eps):
        light = dataclasses.replace(s.light, color=s.light.color * (1.0 + eps))
        l, grads = vg(dataclasses.replace(s, light=light))
        gsum = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads)
                   if hasattr(x, "dtype") and x.dtype == jnp.float32)
        return l + 0.0 * gsum

    @jax.jit
    def chain(s, l0):
        def body(l, _):
            return step(s, l * 1e-7), None
        l, _ = jax.lax.scan(body, l0, None, length=2)
        return l

    l0 = jnp.float32(0.0)
    t0 = time.perf_counter()
    v = float(chain(scene, l0))
    print(f"compile+first: {time.perf_counter()-t0:.1f} s, loss={v:.5f}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(scene, l0))
        ts.append((time.perf_counter() - t0) / 2)
    dt = min(ts)
    rays = W * H * SPP * B * 2
    print(f"config5 fwd+bwd: {dt*1e3:.0f} ms/step, "
          f"{rays/dt/1e6:.0f} Mrays/s")


if __name__ == "__main__":
    main()
