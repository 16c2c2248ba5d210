"""Record-replay Pallas backward for the MIS megakernel
(ops/pallas_mis_bwd.py): forward values are the trace kernel's own output;
gradients must match jax.grad of the jnp oracle across every parameter group
(light photometry/geometry, triangle materials/geometry, camera). Interpret
mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.ops.pallas_mis_bwd import (render_mis_decoupled,
                                                 render_mis_fused)
from gpuraytracer_tpu.render import render_mis
from gpuraytracer_tpu.scene import cornell_box, cornell_box_with_spheres
from gpuraytracer_tpu.types import RenderConfig

_CFG = RenderConfig(width=16, height=8, integrator="mis", camera_rays=2,
                    mis_samples=6, pixel_chunk=128)


@pytest.fixture(scope="module")
def scene():
    return cornell_box(resolution=(16, 8))


@pytest.fixture(scope="module")
def grads(scene):
    g_f = jax.grad(lambda s: jnp.mean(render_mis_fused(s, _CFG)),
                   allow_int=True)(scene)
    g_o = jax.grad(lambda s: jnp.mean(render_mis(s, _CFG).hdr),
                   allow_int=True)(scene)
    return g_f, g_o


@pytest.mark.smoke
def test_mis_fused_value_matches_oracle(scene):
    out = np.asarray(render_mis_fused(scene, _CFG))
    oracle = np.asarray(render_mis(scene, _CFG).hdr)
    np.testing.assert_allclose(out, oracle, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("group", [
    "light.emitted_radiance", "light.center", "light.normal",
    "light.width", "light.depth",
    "triangles.verts", "triangles.diffuse", "triangles.metallic",
    "triangles.roughness",
    "camera.position", "camera.direction", "camera.up",
])
def test_mis_fused_grads_match_oracle(grads, group):
    g_f, g_o = grads
    obj_f, obj_o = g_f, g_o
    for part in group.split("."):
        obj_f = getattr(obj_f, part)
        obj_o = getattr(obj_o, part)
    a, b = np.asarray(obj_f), np.asarray(obj_o)
    assert np.abs(b).max() > 0.0, f"oracle grad for {group} is all-zero"
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=1e-5 * max(scale, 1.0), rtol=2e-4)


@pytest.fixture(scope="module")
def sphere_scene():
    return cornell_box_with_spheres(resolution=(16, 8))


@pytest.fixture(scope="module")
def sphere_grads(sphere_scene):
    g_f = jax.grad(lambda s: jnp.mean(render_mis_fused(s, _CFG)),
                   allow_int=True)(sphere_scene)
    g_o = jax.grad(lambda s: jnp.mean(render_mis(s, _CFG).hdr),
                   allow_int=True)(sphere_scene)
    return g_f, g_o


@pytest.mark.smoke
def test_mis_fused_sphere_value_matches_oracle(sphere_scene):
    out = np.asarray(render_mis_fused(sphere_scene, _CFG))
    oracle = np.asarray(render_mis(sphere_scene, _CFG).hdr)
    np.testing.assert_allclose(out, oracle, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("group", [
    "spheres.center", "spheres.radius", "spheres.diffuse",
    "triangles.verts", "triangles.diffuse",
    "light.emitted_radiance", "light.center", "camera.position",
])
def test_mis_fused_sphere_grads_match_oracle(sphere_grads, group):
    g_f, g_o = sphere_grads
    obj_f, obj_o = g_f, g_o
    for part in group.split("."):
        obj_f = getattr(obj_f, part)
        obj_o = getattr(obj_o, part)
    a, b = np.asarray(obj_f), np.asarray(obj_o)
    assert np.abs(b).max() > 0.0, f"oracle grad for {group} is all-zero"
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=1e-5 * max(scale, 1.0), rtol=2e-4)


def test_mis_decoupled_routes_sphere_scenes_fused(sphere_scene):
    """render_mis_decoupled is the fused path for every scene type now."""
    out = np.asarray(render_mis_decoupled(sphere_scene, _CFG))
    oracle = np.asarray(render_mis(sphere_scene, _CFG).hdr)
    np.testing.assert_allclose(out, oracle, atol=5e-4, rtol=1e-3)


def test_mis_occluder_culling_preserves_render(scene, sphere_scene):
    """The MIS kernel's light-probe occluder culling (including the culled
    light-panel/hull triangles) changes no visibility decision: masked and
    full-loop renders agree to compilation-variance ulps on both triangle
    and sphere scenes (ADVICE r3 — this path was previously exercised only
    by bench.py/CLI)."""
    from gpuraytracer_tpu.intersect import potential_occluders

    for s in (scene, sphere_scene):
        occ = potential_occluders(s, _CFG)
        assert not all(occ), "expected at least one culled triangle"
        a = np.asarray(render_mis_fused(s, _CFG, occluders=occ))
        b = np.asarray(render_mis_fused(s, _CFG))
        np.testing.assert_allclose(a, b, atol=5e-8, rtol=1e-6)
