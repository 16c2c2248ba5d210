"""Multi-chip rendering on the fast kernel paths (parallel/fast.py):
pixels sharded over ``rays``, trace kernel forward + hand-written Pallas
backward per shard, parameter-gradient psum by shard_map transpose.
Runs on the 8 virtual CPU devices from conftest (interpret-mode kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused
from gpuraytracer_tpu.parallel.fast import render_path_fused_sharded
from gpuraytracer_tpu.parallel.mesh import make_ray_mesh
from gpuraytracer_tpu.scene import cornell_box
from gpuraytracer_tpu.types import RenderConfig

# 128 x 64 = 8192 pixels = 2 devices x one 4096-ray tile each.
_CFG = RenderConfig(width=128, height=64, integrator="path", spp=2,
                    bounces=2, pixel_chunk=2048)


@pytest.fixture(scope="module")
def scene():
    return cornell_box(resolution=(128, 64))


@pytest.fixture(scope="module")
def mesh():
    return make_ray_mesh(jax.devices()[:2])


def test_sharded_fused_matches_single_chip(scene, mesh):
    sharded = np.asarray(render_path_fused_sharded(scene, _CFG, mesh))
    single = np.asarray(render_path_decoupled_fused(scene, _CFG))
    # Per-pixel RNG is a pure function of the global pixel id, so the only
    # slack is fusion-context fp noise in the final scale.
    np.testing.assert_allclose(sharded, single, atol=1e-7, rtol=1e-6)


@pytest.mark.smoke
def test_sharded_fused_grads_match_single_chip(scene, mesh):
    g_s = jax.grad(lambda s: jnp.mean(render_path_fused_sharded(s, _CFG, mesh)),
                   allow_int=True)(scene)
    g_1 = jax.grad(lambda s: jnp.mean(render_path_decoupled_fused(s, _CFG)),
                   allow_int=True)(scene)
    for name in ["light", "triangles", "camera"]:
        a = jax.tree.leaves(getattr(g_s, name))
        b = jax.tree.leaves(getattr(g_1, name))
        for x, y in zip(a, b):
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           atol=1e-8, rtol=1e-5)


def test_sharded_fused_rejects_indivisible(scene, mesh):
    # 101*3 = 303 pixels cannot split evenly over the 2-device mesh
    # (per-shard TILE padding handles everything that does split evenly).
    cfg = _CFG.replace(width=101, height=3)
    with pytest.raises(ValueError):
        render_path_fused_sharded(scene, cfg, mesh)


def test_overlapped_grad_matches_plain_fused():
    """Per-microtile-psum gradients (overlapped all-reduce design,
    parallel/fast.make_overlapped_grad_fn) == jax.grad of the plain fused
    sharded loss (single end-of-backward psum) up to fp summation order."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gpuraytracer_tpu.parallel.fast import (make_overlapped_grad_fn,
                                                render_path_fused_sharded)
    from gpuraytracer_tpu.parallel.mesh import make_ray_mesh
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig

    cfg = RenderConfig(width=64, height=32, integrator="path", spp=1,
                       bounces=2)
    scene = cornell_box(resolution=(64, 32))
    mesh = make_ray_mesh(jax.devices()[:8])
    target = jnp.zeros((32, 64, 3), jnp.float32)

    def plain_loss(s):
        img = render_path_fused_sharded(s, cfg, mesh)
        return jnp.mean((img - target) ** 2)

    l_plain, g_plain = jax.value_and_grad(plain_loss, allow_int=True)(scene)

    grad_fn = make_overlapped_grad_fn(scene, cfg, mesh, n_microtiles=2)
    l_over, g_over = jax.jit(grad_fn)(scene, target)

    np.testing.assert_allclose(float(l_over), float(l_plain), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_over), jax.tree.leaves(g_plain)):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-4)


def test_sharded_records_only_config5_shape(scene, mesh):
    """BASELINE config 5 end-to-end shape: the records-only (recompute-RNG)
    fused step THROUGH render_path_fused_sharded — sharded tiles + grad
    all-reduce in one code path. CPU-feasible stand-in for 1024^2 x 256 spp:
    same code, reduced extent; records_only forced as the full-scale config
    would auto-select it. Values and grads must equal the single-device
    plane-mode run."""
    from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused

    out_sh = np.asarray(jax.jit(
        lambda s: render_path_fused_sharded(s, _CFG, mesh,
                                            records_only=True))(scene))
    out_one = np.asarray(render_path_decoupled_fused(scene, _CFG,
                                                     records_only=False))
    # records_only regenerates the draws in-kernel while plane mode reads
    # the pregen planes — separately compiled arithmetic, ~1 ulp apart
    # (decisions stay bit-equal; see test_pallas_shade records_only tests).
    np.testing.assert_allclose(out_sh, out_one, atol=5e-8, rtol=1e-6)

    g_sh = jax.grad(lambda s: jnp.mean(render_path_fused_sharded(
        s, _CFG, mesh, records_only=True)), allow_int=True)(scene)
    g_one = jax.grad(lambda s: jnp.mean(render_path_decoupled_fused(
        s, _CFG, records_only=False)), allow_int=True)(scene)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_one)):
        if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.size:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-5)


# ---- variant-A MIS sharding (round 5 — --devices is no longer
# integrator-shaped) ------------------------------------------------------

_MIS_CFG = RenderConfig(width=128, height=64, integrator="mis",
                        camera_rays=2, mis_samples=6, pixel_chunk=2048)


def test_sharded_mis_fused_matches_single_chip(scene, mesh):
    from gpuraytracer_tpu.ops.pallas_mis_bwd import render_mis_fused
    from gpuraytracer_tpu.parallel.fast import render_mis_fused_sharded

    sharded = np.asarray(render_mis_fused_sharded(scene, _MIS_CFG, mesh))
    single = np.asarray(render_mis_fused(scene, _MIS_CFG))
    # Pixel math is identical (global-pixel jitter via rid_base); the only
    # slack is fusion-context fp noise through the long MIS chains
    # (measured 2.4e-6 max relative, zero decision flips).
    np.testing.assert_allclose(sharded, single, atol=1e-6, rtol=1e-5)


def test_sharded_mis_fused_grads_match_single_chip(scene, mesh):
    from gpuraytracer_tpu.ops.pallas_mis_bwd import render_mis_fused
    from gpuraytracer_tpu.parallel.fast import render_mis_fused_sharded

    g_s = jax.grad(
        lambda s: jnp.mean(render_mis_fused_sharded(s, _MIS_CFG, mesh)),
        allow_int=True)(scene)
    g_1 = jax.grad(lambda s: jnp.mean(render_mis_fused(s, _MIS_CFG)),
                   allow_int=True)(scene)
    for name in ["light", "triangles", "camera"]:
        a = jax.tree.leaves(getattr(g_s, name))
        b = jax.tree.leaves(getattr(g_1, name))
        for x, y in zip(a, b):
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                y = np.asarray(y)
                scale = max(np.abs(y).max(), 1e-6)
                np.testing.assert_allclose(np.asarray(x), y,
                                           atol=1e-5 * scale, rtol=1e-4)
