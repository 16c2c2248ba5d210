"""Scaling-efficiency harness (BASELINE north-star: >=90% rays/s efficiency
1 host -> 4 hosts).

Renders the same global workload on 1..N devices of the current backend and
reports rays/s + efficiency vs the single-device rate. On the one real
v5e chip available this round it can only produce the n=1 row; run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`` to
exercise the full sweep on virtual devices (numbers then validate the
harness and the sharding, not TPU throughput).

Usage: python benchmarks/scaling.py [--width 512 --height 512 --spp 4]
Prints one JSON line per device count.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from gpuraytracer_tpu.parallel.fast import render_path_fused_sharded
    from gpuraytracer_tpu.parallel.mesh import make_ray_mesh
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig
    from gpuraytracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    config = RenderConfig(width=args.width, height=args.height,
                          integrator="path", spp=args.spp,
                          bounces=args.bounces)
    scene = cornell_box(resolution=(args.width, args.height))
    rays = args.width * args.height * args.spp * args.bounces * 2

    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    base_rate = None
    for n in counts:
        mesh = make_ray_mesh(devices[:n])

        def run():
            hdr = render_path_fused_sharded(scene, config, mesh)
            jax.block_until_ready(hdr)

        run()  # compile
        dt = min(_t(run) for _ in range(args.iters))
        rate = rays / dt / 1e6
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "devices": n,
            "ms_per_frame": round(dt * 1e3, 2),
            "mrays_s": round(rate, 1),
            "efficiency_vs_1": round(rate / (base_rate * n), 3),
        }))


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
