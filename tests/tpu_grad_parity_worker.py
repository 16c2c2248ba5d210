"""Worker for tests/test_tpu_hw.py — NOT a test module; requires a REAL TPU.

Validates the DEFAULT-precision bf16 two-chunk cotangent accumulation in the
hand-written Pallas backwards ON HARDWARE (ADVICE r3): the CPU/interpret CI
tier multiplies in f32 where the chunk split is exact, so it never exercises
the TPU bf16 rounding path (<=2^-18 rel per partial). Here the fused kernels
run compiled on the TPU and their gradients are compared against jax.grad of
the jnp oracle running on the SAME TPU — including parameter groups whose
per-sample contributions nearly cancel (triangle vertex cotangents mix
positive/negative plane terms; camera basis cotangents mix all pixels).

Exit codes: 0 = parity OK, 42 = no TPU available (callers skip).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "tpu":
    print(f"NO_TPU backend={jax.default_backend()}", flush=True)
    sys.exit(42)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpuraytracer_tpu.ops.pallas_mis_bwd import render_mis_fused  # noqa: E402
from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused  # noqa: E402
from gpuraytracer_tpu.render import render, render_mis  # noqa: E402
from gpuraytracer_tpu.scene import cornell_box_with_spheres  # noqa: E402
from gpuraytracer_tpu.types import RenderConfig  # noqa: E402

scene = jax.device_put(cornell_box_with_spheres(resolution=(64, 64)))

checks = [
    ("path", RenderConfig(width=64, height=64, integrator="path", spp=4,
                          bounces=3, pixel_chunk=4096),
     render_path_decoupled_fused, lambda s, c: render(s, c).hdr),
    ("mis", RenderConfig(width=64, height=64, integrator="mis",
                         camera_rays=2, mis_samples=6, pixel_chunk=4096),
     render_mis_fused, lambda s, c: render_mis(s, c).hdr),
]

GROUPS = ["triangles.verts", "triangles.diffuse", "spheres.center",
          "spheres.radius", "spheres.diffuse", "light.color",
          "light.emitted_radiance", "light.center", "light.normal",
          "camera.position", "camera.direction", "camera.up"]

failed = []
for name, cfg, fused, oracle in checks:
    g_f = jax.jit(jax.grad(lambda s: jnp.mean(fused(s, cfg)),
                           allow_int=True))(scene)
    g_o = jax.jit(jax.grad(lambda s: jnp.mean(oracle(s, cfg)),
                           allow_int=True))(scene)
    for group in GROUPS:
        a, b = g_f, g_o
        for part in group.split("."):
            a, b = getattr(a, part), getattr(b, part)
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        if scale == 0.0:
            continue
        # Error relative to the group's gradient scale: the bf16 two-chunk
        # accumulation bounds each PARTIAL to <=2^-18 rel, but partials can
        # cancel — the honest bound is on the max-norm-relative error, and
        # the grad-consumer (optax) only sees that scale anyway.
        rel = np.abs(a - b).max() / scale
        status = "OK" if rel < 1e-3 else "FAIL"
        if status == "FAIL":
            failed.append((name, group, rel))
        print(f"{name:5s} {group:25s} max|d|/scale = {rel:.3e}  {status}",
              flush=True)

if failed:
    print(f"TPU_GRAD_PARITY_FAILED {failed}", flush=True)
    sys.exit(1)
print("TPU_GRAD_PARITY_OK", flush=True)
