"""Fused silhouette-gradient kernel pair (ops/pallas_soft.py — VERDICT r3
#2): values equal the hard render; gradients equal jax.grad of the
edge-aware jnp oracle (grad/diff_render.render_direct_soft), INCLUDING the
sphere-center/radius silhouette boundary terms. Interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.grad.diff_render import render_direct_soft
from gpuraytracer_tpu.ops.pallas_soft import render_direct_soft_fused
from gpuraytracer_tpu.scene import cornell_box_with_spheres
from gpuraytracer_tpu.types import RenderConfig

_CFG = RenderConfig(width=24, height=24, integrator="direct", spp=2,
                    bounces=1, pixel_chunk=576)
_KAPPA = 0.1


@pytest.fixture(scope="module")
def scene():
    return cornell_box_with_spheres(resolution=(24, 24))


@pytest.mark.smoke
def test_soft_fused_value_matches_oracle(scene):
    v_f = np.asarray(render_direct_soft_fused(scene, _CFG, _KAPPA))
    v_o = np.asarray(render_direct_soft(scene, _CFG, _KAPPA))
    np.testing.assert_allclose(v_f, v_o, atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def grads(scene):
    g_f = jax.grad(
        lambda s: jnp.mean(render_direct_soft_fused(s, _CFG, _KAPPA)),
        allow_int=True)(scene)
    g_o = jax.grad(
        lambda s: jnp.mean(render_direct_soft(s, _CFG, _KAPPA)),
        allow_int=True)(scene)
    return g_f, g_o


@pytest.mark.parametrize("group", [
    "spheres.center", "spheres.radius", "spheres.diffuse",
    "triangles.verts", "triangles.diffuse", "triangles.emissive",
    "light.color", "light.center", "light.normal",
    "camera.position", "camera.direction",
])
def test_soft_fused_grads_match_oracle(grads, group):
    g_f, g_o = grads
    a, b = g_f, g_o
    for part in group.split("."):
        a, b = getattr(a, part), getattr(b, part)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(b).max() > 0.0, f"oracle grad for {group} is all-zero"
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


def test_soft_fused_occluders_preserve_grads(scene):
    """Static shadow culling on the silhouette record pass changes neither
    values nor gradients."""
    from gpuraytracer_tpu.intersect import potential_occluders
    occ = potential_occluders(scene, _CFG)
    g_a = jax.grad(
        lambda s: jnp.mean(render_direct_soft_fused(s, _CFG, _KAPPA,
                                                    occluders=occ)),
        allow_int=True)(scene)
    g_b = jax.grad(
        lambda s: jnp.mean(render_direct_soft_fused(s, _CFG, _KAPPA)),
        allow_int=True)(scene)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-8, rtol=1e-5)


def test_inverse_rendering_recovers_center_shift_fast():
    """BASELINE config 4's hardest ask at KERNEL speed: sphere-center
    recovery via inverse_render(soft=True, fast=True) on the fused
    silhouette pair (the oracle-speed version of this test lives in
    test_grad.py)."""
    import optax

    from gpuraytracer_tpu.grad.inverse import (SceneParams, extract_params,
                                               inverse_render, render_hdr)
    cfg = RenderConfig(width=32, height=32, integrator="direct", spp=2,
                       bounces=1, pixel_chunk=1024)
    scene32 = cornell_box_with_spheres(resolution=(32, 32))
    true_params = extract_params(scene32)
    target = render_hdr(scene32, cfg)

    init = SceneParams(
        sphere_centers=true_params.sphere_centers
        + jnp.array([[0.15, 0.0, -0.1], [-0.1, 0.05, 0.1]]),
        sphere_diffuse=true_params.sphere_diffuse,
        light_emission=true_params.light_emission,
    )
    # lr 3.5e2 (not the oracle test's 5e2): the loss landscape is
    # knife-edged at 5e2 — the oracle trajectory happens to stay in the
    # basin while the fused one (identical gradients to 1e-8 at any fixed
    # scene, but 1-ulp decision flips at silhouette pixels along the way)
    # escapes it. At 3.5e2 both loops converge with margin.
    res = inverse_render(scene32, target, init, cfg, steps=600, soft=True,
                         fast=True, kappa=0.1,
                         optimizer=optax.sgd(3.5e2, momentum=0.9))
    losses = np.asarray(res.losses)
    assert losses[-1] < losses[0] * 0.1
    err0 = np.abs(np.asarray(init.sphere_centers)
                  - np.asarray(true_params.sphere_centers)).max()
    err1 = np.abs(np.asarray(res.params.sphere_centers)
                  - np.asarray(true_params.sphere_centers)).max()
    assert err1 < err0 * 0.5
