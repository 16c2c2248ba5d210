"""Hand-written Pallas backward (ops/pallas_shade.py): values are the trace
kernel's own output; gradients must match jax.grad of the jnp oracle across
every parameter group (light, triangles, camera). Interpret mode on CPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused
from gpuraytracer_tpu.render import render
from gpuraytracer_tpu.scene import cornell_box, cornell_box_with_spheres
from gpuraytracer_tpu.types import RenderConfig

_CFG = RenderConfig(width=16, height=8, integrator="path", spp=2, bounces=2,
                    pixel_chunk=128)


@pytest.fixture(scope="module")
def scene():
    return cornell_box(resolution=(16, 8))


@pytest.fixture(scope="module")
def grads(scene):
    g_f = jax.grad(lambda s: jnp.mean(render_path_decoupled_fused(s, _CFG)),
                   allow_int=True)(scene)
    g_o = jax.grad(lambda s: jnp.mean(render(s, _CFG).hdr),
                   allow_int=True)(scene)
    return g_f, g_o


@pytest.mark.smoke
def test_fused_value_matches_oracle(scene):
    out = np.asarray(render_path_decoupled_fused(scene, _CFG))
    oracle = np.asarray(render(scene, _CFG).hdr)
    np.testing.assert_allclose(out, oracle, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("group", [
    "light.color", "light.center", "light.normal",
    "triangles.verts", "triangles.diffuse", "triangles.emissive",
    "camera.position", "camera.direction", "camera.up",
])
def test_fused_grads_match_oracle(grads, group):
    g_f, g_o = grads
    obj_f, obj_o = g_f, g_o
    for part in group.split("."):
        obj_f = getattr(obj_f, part)
        obj_o = getattr(obj_o, part)
    a, b = np.asarray(obj_f), np.asarray(obj_o)
    assert np.abs(b).max() > 0.0, f"oracle grad for {group} is all-zero"
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


@pytest.fixture(scope="module")
def sphere_scene16():
    return cornell_box_with_spheres(resolution=(16, 8))


@pytest.fixture(scope="module")
def sphere_grads(sphere_scene16):
    g_f = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, _CFG)), allow_int=True)(sphere_scene16)
    g_o = jax.grad(lambda s: jnp.mean(render(s, _CFG).hdr),
                   allow_int=True)(sphere_scene16)
    return g_f, g_o


@pytest.mark.smoke
def test_fused_sphere_value_matches_oracle(sphere_scene16):
    """The fused backward now carries the analytic-sphere branch (BASELINE
    config 1/4 scenes at kernel speed)."""
    out = np.asarray(render_path_decoupled_fused(sphere_scene16, _CFG))
    oracle = np.asarray(render(sphere_scene16, _CFG).hdr)
    np.testing.assert_allclose(out, oracle, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("group", [
    "spheres.center", "spheres.radius", "spheres.diffuse",
    "light.color", "light.center", "triangles.verts", "triangles.diffuse",
    "camera.position", "camera.direction",
])
def test_fused_sphere_grads_match_oracle(sphere_grads, group):
    g_f, g_o = sphere_grads
    obj_f, obj_o = g_f, g_o
    for part in group.split("."):
        obj_f = getattr(obj_f, part)
        obj_o = getattr(obj_o, part)
    a, b = np.asarray(obj_f), np.asarray(obj_o)
    assert np.abs(b).max() > 0.0, f"oracle grad for {group} is all-zero"
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


def test_sphere_records_only_matches_plane_mode(sphere_scene16):
    """Sphere scenes through the recompute-RNG (config-5 memory) mode."""
    out_a = render_path_decoupled_fused(sphere_scene16, _CFG,
                                        records_only=False)
    out_b = render_path_decoupled_fused(sphere_scene16, _CFG,
                                        records_only=True)
    # The two modes source their draws from separately compiled kernels
    # (pregen planes vs in-kernel recompute): discrete decisions stay
    # bit-equal (the record streams match exactly) but the continuous
    # radiance math can differ by ~1 ulp of draw rounding.
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=5e-8, rtol=1e-6)
    g_a = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, _CFG, records_only=False)),
        allow_int=True)(sphere_scene16)
    g_b = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, _CFG, records_only=True)),
        allow_int=True)(sphere_scene16)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-5)


def test_decoupled_dispatch_uses_fused_for_triangle_scene(scene):
    """render_path_decoupled routes triangle scenes through the fused path
    and sphere scenes through the jnp replay — both stay differentiable."""
    from gpuraytracer_tpu.ops import render_path_decoupled
    out = np.asarray(render_path_decoupled(scene, _CFG))
    oracle = np.asarray(render(scene, _CFG).hdr)
    np.testing.assert_allclose(out, oracle, atol=2e-5, rtol=1e-4)


def test_records_only_grads_match_plane_mode(scene):
    """records_only (BASELINE config-5 memory mode): the backward kernel
    regenerates the Halton draws from the RNG offsets instead of reading
    recorded planes — decisions are bit-equal and values/gradients agree
    to draw-rounding ulps with the plane mode."""
    import numpy as np

    out_a = render_path_decoupled_fused(scene, _CFG, records_only=False)
    out_b = render_path_decoupled_fused(scene, _CFG, records_only=True)
    # The two modes source their draws from separately compiled kernels
    # (pregen planes vs in-kernel recompute): discrete decisions stay
    # bit-equal (the record streams match exactly) but the continuous
    # radiance math can differ by ~1 ulp of draw rounding.
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=5e-8, rtol=1e-6)

    g_a = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, _CFG, records_only=False)),
        allow_int=True)(scene)
    g_b = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, _CFG, records_only=True)),
        allow_int=True)(scene)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-5)


def test_records_only_stratified_sampler(scene):
    """Stratified camera jitter regenerates identically in the backward."""
    import numpy as np
    cfg = _CFG.replace(spp=4, sampler="stratified")
    out_a = render_path_decoupled_fused(scene, cfg, records_only=False)
    out_b = render_path_decoupled_fused(scene, cfg, records_only=True)
    # The two modes source their draws from separately compiled kernels
    # (pregen planes vs in-kernel recompute): discrete decisions stay
    # bit-equal (the record streams match exactly) but the continuous
    # radiance math can differ by ~1 ulp of draw rounding.
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=5e-8, rtol=1e-6)
    g_a = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, cfg, records_only=False)),
        allow_int=True)(scene)
    g_b = jax.grad(lambda s: jnp.mean(
        render_path_decoupled_fused(s, cfg, records_only=True)),
        allow_int=True)(scene)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-5)
