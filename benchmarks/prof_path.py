"""Attribute the fused path fwd+bwd time to its pieces on the real chip.

Times, with the perturbation-chained lax.scan harness (see bench.py for why
any other timing lies on this transport):
  fwd            plain megakernel forward (no record stream)
  fwd+rec        record-emitting forward (the fused pair's actual forward)
  fwd+rec(only)  records_only variant (int records, draws recomputed in bwd)
  pair           fused fwd+bwd via render_path_decoupled_fused
  pair(only)     fused fwd+bwd, records_only=True

backward cost = pair - fwd+rec.  Run: python benchmarks/prof_path.py
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
    from gpuraytracer_tpu.ops.pallas_path import (_render_pallas_impl,
                                                  pregen_draws)
    from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig
    from gpuraytracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    W = H = 512
    SPP, B = 16, 3
    ITERS = 8
    cfg = RenderConfig(width=W, height=H, integrator="path", spp=SPP,
                       bounces=B, pixel_chunk=65536)
    scene = jax.device_put(cornell_box(resolution=(W, H)))
    rays = W * H * SPP * B * 2

    def perturb(s, l):
        light = dataclasses.replace(s.light, color=s.light.color
                                    * (1.0 + l * 1e-7))
        return dataclasses.replace(s, light=light)

    def fwd_chain(render):
        @jax.jit
        def chain(s, l0):
            def body(l, _):
                out = render(perturb(s, l))
                hdr = out[0] if isinstance(out, tuple) else out
                return jnp.mean(hdr), None
            l, _ = jax.lax.scan(body, l0, None, length=ITERS)
            return l
        return chain

    def pair_chain(render):
        vg = jax.value_and_grad(lambda s: jnp.mean(render(s)),
                                allow_int=True)

        @jax.jit
        def chain(s, l0):
            def body(l, _):
                v, g = vg(perturb(s, l))
                gsum = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)
                           if hasattr(x, "dtype") and x.dtype == jnp.float32)
                return v + 0.0 * gsum, None
            l, _ = jax.lax.scan(body, l0, None, length=ITERS)
            return l
        return chain

    draws = jax.block_until_ready(jax.jit(lambda: pregen_draws(cfg))())
    variants = {
        "fwd": fwd_chain(lambda s: _render_pallas_impl(s, cfg)),
        "fwd+rec": fwd_chain(lambda s: _render_pallas_impl(
            s, cfg, emit_records=True, raw_records=True, draws=draws)),
        "fwd+rec(only)": fwd_chain(lambda s: _render_pallas_impl(
            s, cfg, emit_records=True, records_only=True)),
        "pair": pair_chain(
            lambda s: render_path_decoupled_fused(s, cfg, records_only=False,
                                                  draws=draws)),
        "pair(only)": pair_chain(
            lambda s: render_path_decoupled_fused(s, cfg,
                                                  records_only=True)),
    }
    l0 = jnp.float32(0.0)
    for name, chain in variants.items():
        float(chain(scene, l0))  # compile + warm
        dt = min(_t(lambda: float(chain(scene, l0))) for _ in range(3))
        dt /= ITERS
        print(f"{name:14s} {dt*1e3:7.2f} ms  {rays/dt/1e6:7.0f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
