"""Worker for tests/test_tpu_hw.py — NOT a test module; requires a REAL TPU.

Validates the DEFAULT-precision bf16 chunk-split matmul path of the
hand-written Pallas backwards ON HARDWARE (ADVICE r3): the CPU/interpret CI
tier multiplies in f32 where the chunk splits are exact, so it never
exercises real-MXU rounding. Round-4 findings this worker produced:

  * The round-3 TWO-chunk cotangent accumulation truncated residuals that
    near-cancelling partials amplify — switched to the exact THREE-chunk
    split (pallas_shade/pallas_mis_bwd).
  * Several AD-safety floors overflowed f32 in REVERSE mode only
    (rsqrt's u^-1.5 at a 1e-30 floor; d_ggx's squared 1e-20 guard) —
    raised to 1e-12 everywhere.
  * PATH-kernel thresholds below are cancellation-aware: the sphere-radius
    gradient's per-pixel contributions cancel ~288:1 (measured by
    random-sign probes at this exact config), so f32 summation-order
    differences between MXU and interpret legitimately reach ~1e-2 of the
    max-norm there; well-conditioned groups sit at 1e-6..1e-5.
  * The MIS section runs in REPORT-ONLY mode: on TPU the jnp ORACLE's own
    AD produces NaNs confined to light-panel-hit pixels (clean on CPU —
    an XLA:TPU lowering difference under investigation, BASELINE.md
    "hardware gradient numerics"), so it cannot serve as hardware truth
    for the fused backward yet.

Exit codes: 0 = path parity OK (MIS reported), 42 = no TPU, 1 = failure.
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

# (group, threshold on max|fused - oracle| / max|oracle|). Thresholds are
# ~4x the measured stable values, scaled by each group's measured
# cancellation (see module docstring).
PATH_CHECKS = [
    ("triangles.verts", 3e-4), ("triangles.diffuse", 1e-5),
    ("spheres.center", 3e-3), ("spheres.radius", 1.5e-2),
    ("spheres.diffuse", 1e-5), ("light.color", 1e-5),
    ("light.center", 1e-5), ("light.normal", 1e-5),
    ("camera.position", 3e-3), ("camera.direction", 3e-3),
    ("camera.up", 3e-3),
]
MIS_GROUPS = [g for g, _ in PATH_CHECKS if g != "light.color"] + [
    "light.emitted_radiance"]


def grads(fused, oracle, cfg):
    g_f = jax.jit(jax.grad(lambda s: jnp.mean(fused(s, cfg)),
                           allow_int=True))(scene)
    g_o = jax.jit(jax.grad(lambda s: jnp.mean(oracle(s, cfg)),
                           allow_int=True))(scene)
    return g_f, g_o


def rel(g_f, g_o, group):
    a, b = g_f, g_o
    for part in group.split("."):
        a, b = getattr(a, part), getattr(b, part)
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max()
    if scale == 0.0:
        return None, 0
    return np.abs(a - b).max() / scale, int(np.isnan(a).sum())


failed = []
cfg_p = RenderConfig(width=64, height=64, integrator="path", spp=4,
                     bounces=3, pixel_chunk=4096)
g_f, g_o = grads(render_path_decoupled_fused, lambda s, c: render(s, c).hdr,
                 cfg_p)
for group, tol in PATH_CHECKS:
    r, nn = rel(g_f, g_o, group)
    if r is None:
        continue
    status = "OK" if (r < tol and nn == 0) else "FAIL"
    if status == "FAIL":
        failed.append(("path", group, float(r)))
    print(f"path  {group:25s} max|d|/scale = {r:.3e} (tol {tol:.0e}) "
          f"{status}", flush=True)

cfg_m = RenderConfig(width=64, height=64, integrator="mis", camera_rays=2,
                     mis_samples=6, pixel_chunk=4096)
g_f, g_o = grads(render_mis_fused, lambda s, c: render_mis(s, c).hdr, cfg_m)
# Forward decision-flip evidence: pixels where the two implementations'
# closest-hit/probe decisions diverged at an FP knife edge show large
# localized value differences — those same pixels carry bodily different
# (but individually valid) geometry subgradients, which is what the ~1e-1
# geometry-group deviations below are. NaN-freedom is the asserted part.
h_f = np.asarray(jax.jit(lambda s: render_mis_fused(s, cfg_m))(scene))
h_o = np.asarray(jax.jit(lambda s: render_mis(s, cfg_m).hdr)(scene))
flips = int((np.abs(h_f - h_o).max(axis=-1) > 1e-3).sum())
print(f"mis   forward decision-flip pixels (|d|>1e-3): {flips} / "
      f"{64 * 64}", flush=True)
for group in MIS_GROUPS:
    r, nn = rel(g_f, g_o, group)
    if r is None:
        continue
    status = "OK" if nn == 0 else "FAIL"
    if nn:
        failed.append(("mis-nan", group, float(r)))
    print(f"mis   {group:25s} max|d|/scale = {r:.3e} nan_fused={nn} "
          f"{status} (deviation report-only)", flush=True)

# ---- MIS masked-flip assertion (round 5 — VERDICT r4 #6): exclude the
# decision-flip pixels identified above from the loss; the REMAINING
# pixels' gradients (geometry groups included) must agree tightly, and
# the flip count itself must stay a fraction of a percent. The mask is
# stop-gradient'd, so both sides differentiate the same masked loss.
assert flips <= int(0.005 * 64 * 64), ("mis flip count", flips)
mask = jnp.asarray(
    (np.abs(h_f - h_o).max(axis=-1) <= 1e-3)[..., None].astype(np.float32))


def masked_grads(fn):
    return jax.jit(jax.grad(
        lambda s: jnp.mean(fn(s) * jax.lax.stop_gradient(mask)),
        allow_int=True))(scene)


gm_f = masked_grads(lambda s: render_mis_fused(s, cfg_m))
gm_o = masked_grads(lambda s: render_mis(s, cfg_m).hdr)
for group in MIS_GROUPS:
    r, nn = rel(gm_f, gm_o, group)
    if r is None:
        continue
    ok = r < 3e-4 and nn == 0
    if not ok:
        failed.append(("mis-masked", group, float(r)))
    print(f"mis*  {group:25s} masked max|d|/scale = {r:.3e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)

# ---- Grouped tier on hardware (round 5 — VERDICT r4 #5): the dynamic-
# SMEM-index traversal + block-contracted fetch/accumulate paths are the
# newest Mosaic surfaces; assert them against the jnp oracle ON the chip
# for BOTH kernel families (variant-B path and variant-A MIS).
from gpuraytracer_tpu.scene import cornell_box_tessellated  # noqa: E402

tess = jax.device_put(cornell_box_tessellated(
    resolution=(64, 64), wall_subdiv=3, sphere_subdiv=1))
assert tess.triangles.num_triangles > 64  # grouped tier engaged

h_gf = np.asarray(jax.jit(
    lambda s: render_path_decoupled_fused(s, cfg_p))(tess))
h_go = np.asarray(jax.jit(lambda s: render(s, cfg_p).hdr)(tess))
gflips = int((np.abs(h_gf - h_go).max(axis=-1) > 1e-3).sum())
print(f"grouped-path forward flip pixels: {gflips} / {64 * 64}", flush=True)
assert gflips <= int(0.005 * 64 * 64), ("grouped path flips", gflips)

g_f = jax.jit(jax.grad(
    lambda s: jnp.mean(render_path_decoupled_fused(s, cfg_p)),
    allow_int=True))(tess)
g_o = jax.jit(jax.grad(lambda s: jnp.mean(render(s, cfg_p).hdr),
                       allow_int=True))(tess)
GROUPED_CHECKS = [
    ("triangles.verts", 3e-4), ("triangles.diffuse", 1e-5),
    ("light.color", 1e-5), ("light.center", 3e-5), ("light.normal", 3e-5),
    ("camera.position", 3e-3), ("camera.direction", 3e-3),
    ("camera.up", 3e-3),
]
for group, tol in GROUPED_CHECKS:
    r, nn = rel(g_f, g_o, group)
    if r is None:
        continue
    ok = r < tol and nn == 0
    if not ok:
        failed.append(("grouped-path", group, float(r)))
    print(f"grp-p {group:25s} max|d|/scale = {r:.3e} (tol {tol:.0e}) "
          f"{'OK' if ok else 'FAIL'}", flush=True)

h_mf = np.asarray(jax.jit(lambda s: render_mis_fused(s, cfg_m))(tess))
h_mo = np.asarray(jax.jit(lambda s: render_mis(s, cfg_m).hdr)(tess))
mflips = int((np.abs(h_mf - h_mo).max(axis=-1) > 1e-3).sum())
print(f"grouped-mis forward flip pixels: {mflips} / {64 * 64}", flush=True)
assert mflips <= int(0.005 * 64 * 64), ("grouped mis flips", mflips)
mmask = (np.abs(h_mf - h_mo).max(axis=-1) <= 1e-3)[..., None]
mdev = (np.abs(h_mf - h_mo) * mmask).max() / max(np.abs(h_mo).max(), 1e-9)
print(f"grouped-mis non-flip max|d|/scale = {mdev:.3e}", flush=True)
if mdev >= 1e-4:
    failed.append(("grouped-mis-fwd", "hdr", float(mdev)))

if failed:
    print(f"TPU_GRAD_PARITY_FAILED {failed}", flush=True)
    sys.exit(1)
print("TPU_GRAD_PARITY_OK (path + masked-MIS + grouped asserted)",
      flush=True)
