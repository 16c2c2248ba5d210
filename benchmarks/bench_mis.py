"""MIS megakernel fwd / fwd+bwd timings on the real chip (BASELINE config-2
numbers). Run: python benchmarks/bench_mis.py [mis_samples ...]"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from gpuraytracer_tpu.intersect import potential_occluders
    from gpuraytracer_tpu.ops.pallas_mis import render_mis_pallas
    from gpuraytracer_tpu.ops.pallas_mis_bwd import render_mis_fused
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig
    from gpuraytracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    W = H = 512
    ITERS = 8
    scene = jax.device_put(cornell_box(resolution=(W, H)))
    samples = [int(a) for a in sys.argv[1:]] or [30, 300]

    for ms in samples:
        cfg = RenderConfig(width=W, height=H, integrator="mis",
                           camera_rays=6, mis_samples=ms)
        occ = potential_occluders(scene, cfg)

        def loss(s):
            return jnp.mean(render_mis_fused(s, cfg, occluders=occ))

        vg = jax.value_and_grad(loss, allow_int=True)

        def step(s, eps):
            light = dataclasses.replace(
                s.light, emitted_radiance=s.light.emitted_radiance
                * (1.0 + eps))
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

        @jax.jit
        def fchain(s, l0):
            def body(l, _):
                light = dataclasses.replace(
                    s.light, emitted_radiance=s.light.emitted_radiance
                    * (1.0 + l * 1e-7))
                return jnp.mean(render_mis_pallas(
                    dataclasses.replace(s, light=light), cfg)), None
            l, _ = jax.lax.scan(body, l0, None, length=ITERS)
            return l

        l0 = jnp.float32(0.0)
        float(fchain(scene, l0))
        fdt = min(_t(lambda: float(fchain(scene, l0))) for _ in range(3))
        fdt /= ITERS
        float(chain(scene, l0))
        dt = min(_t(lambda: float(chain(scene, l0))) for _ in range(3))
        dt /= ITERS

        trav = W * H * 6 * (1 + (ms // 3) * 5)
        print(f"mis_samples={ms}: fwd {fdt*1e3:.1f} ms "
              f"({trav/fdt/1e6:.0f} Mrays/s), fwd+bwd {dt*1e3:.1f} ms "
              f"({trav/dt/1e6:.0f} Mrays/s)")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
