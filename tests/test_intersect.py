"""Intersection engine tests: Möller–Trumbore vs analytic expectations,
closest-hit/any-hit semantics, sphere quadratic, differentiability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.intersect import (any_hit, closest_hit, compile_scene)
from gpuraytracer_tpu.scene import make_spheres
from gpuraytracer_tpu.types import TriangleScene


def _single_triangle(v0, v1, v2, emissive=(0, 0, 0)):
    return TriangleScene(
        verts=jnp.asarray(np.array([[v0, v1, v2]], np.float32)),
        diffuse=jnp.ones((1, 3), jnp.float32) * 0.5,
        metallic=jnp.zeros((1,), jnp.float32),
        roughness=jnp.ones((1,), jnp.float32) * 0.3,
        emissive=jnp.asarray(np.array([emissive], np.float32)),
    )


def test_hit_axis_aligned_triangle():
    tri = _single_triangle([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    c = compile_scene(tri)
    assert c.padded_size == 128
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = closest_hit(c, o, d)
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(5.0, abs=1e-5)
    assert int(h.prim[0]) == 0
    np.testing.assert_allclose(np.asarray(h.diffuse[0]), 0.5)


def test_miss_outside_triangle():
    tri = _single_triangle([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    c = compile_scene(tri)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.9, -0.5]])  # passes above
    h = closest_hit(c, o, smp_norm(d))
    assert not bool(h.hit[0])
    assert float(h.t[0]) > 1e29


def smp_norm(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def test_closest_of_two_triangles():
    verts = np.array([
        [[-1, -1, -10], [1, -1, -10], [0, 1, -10]],
        [[-1, -1, -4], [1, -1, -4], [0, 1, -4]],
    ], np.float32)
    tri = TriangleScene(
        verts=jnp.asarray(verts),
        diffuse=jnp.asarray(np.array([[1, 0, 0], [0, 1, 0]], np.float32)),
        metallic=jnp.zeros((2,)), roughness=jnp.zeros((2,)),
        emissive=jnp.zeros((2, 3)),
    )
    c = compile_scene(tri)
    h = closest_hit(c, jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 0, -1]]))
    assert int(h.prim[0]) == 1
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h.diffuse[0]), [0, 1, 0])


def test_normal_matches_winding():
    # CCW when viewed from +z => normal +z (cross(e1, e2)).
    tri = _single_triangle([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    c = compile_scene(tri)
    h = closest_hit(c, jnp.array([[0.0, 0, 5]]), jnp.array([[0.0, 0, -1]]))
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)


def test_t_min_respected():
    tri = _single_triangle([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    c = compile_scene(tri)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = closest_hit(c, o, d, t_min=6.0)
    assert not bool(h.hit[0])


def test_any_hit_max_distance():
    tri = _single_triangle([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    c = compile_scene(tri)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    assert bool(any_hit(c, o, d, 0.0, 10.0)[0])
    assert not bool(any_hit(c, o, d, 0.0, 4.9)[0])  # light dist cutoff


def test_cornell_center_ray(cornell_scene):
    """A ray from the camera straight ahead must hit the back wall at
    z=-2.5: camera z=9 => t = 11.5."""
    c = compile_scene(cornell_scene.triangles)
    o = jnp.array([[0.0, 0.0, 9.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = closest_hit(c, o, d)
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(11.5, abs=1e-4)
    np.testing.assert_allclose(np.asarray(h.diffuse[0]), [0.9, 0.9, 0.9])


def test_cornell_ray_up_hits_light(cornell_scene):
    c = compile_scene(cornell_scene.triangles)
    h = closest_hit(c, jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 1, 0]]))
    assert bool(h.hit[0]) and bool(h.is_emissive[0])
    assert float(h.t[0]) == pytest.approx(2.49, abs=1e-4)


def test_sphere_intersection():
    sph = make_spheres([(0, 0, -5)], [1.0],
                       [dict(diffuse=(0.2, 0.4, 0.6))])
    tri = _single_triangle([-9, -9, -50], [9, -9, -50], [0, 9, -50])
    c = compile_scene(tri)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = closest_hit(c, o, d, spheres=sph)
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-5)  # near root
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.diffuse[0]), [0.2, 0.4, 0.6],
                               atol=1e-6)
    # From inside: far root.
    h2 = closest_hit(c, jnp.array([[0.0, 0, -5]]), d, spheres=sph)
    assert float(h2.t[0]) == pytest.approx(1.0, abs=1e-5)


def test_sphere_grad_wrt_center():
    """d t / d center_z for a head-on ray is -1 (moving the sphere away
    increases t). Differentiable geometry is the BASELINE config-4
    requirement."""
    tri = _single_triangle([-9, -9, -50], [9, -9, -50], [0, 9, -50])
    c = compile_scene(tri)

    def t_of_cz(cz):
        sph = make_spheres([(0.0, 0.0, 0.0)], [1.0],
                           [dict(diffuse=(0.5, 0.5, 0.5))])
        sph = sph.__class__(
            center=jnp.array([[0.0, 0.0, cz]]), radius=sph.radius,
            diffuse=sph.diffuse, metallic=sph.metallic,
            roughness=sph.roughness, emissive=sph.emissive)
        h = closest_hit(c, jnp.array([[0.0, 0, 0]]),
                        jnp.array([[0.0, 0, -1]]), spheres=sph)
        return h.t[0]

    g = jax.grad(t_of_cz)(jnp.float32(-5.0))
    assert float(g) == pytest.approx(-1.0, abs=1e-4)


def test_triangle_grad_wrt_vertices():
    """Moving the triangle plane away from the ray increases t linearly."""
    def t_of_z(z):
        tri = _single_triangle([-1.0, -1.0, 0.0], [1.0, -1.0, 0.0],
                               [0.0, 1.0, 0.0])
        verts = tri.verts + jnp.array([0.0, 0.0, 1.0]) * z
        tri = tri.__class__(verts=verts, diffuse=tri.diffuse,
                            metallic=tri.metallic, roughness=tri.roughness,
                            emissive=tri.emissive)
        c = compile_scene(tri)
        h = closest_hit(c, jnp.array([[0.0, 0, 5]]), jnp.array([[0.0, 0, -1]]))
        return h.t[0]

    g = jax.grad(t_of_z)(jnp.float32(0.0))
    assert float(g) == pytest.approx(-1.0, abs=1e-4)


def test_batched_shapes():
    tri = _single_triangle([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    c = compile_scene(tri)
    o = jnp.zeros((4, 7, 3))
    d = jnp.broadcast_to(jnp.array([0.0, 0, -1]), (4, 7, 3))
    h = closest_hit(c, o, d)
    assert h.hit.shape == (4, 7)
    assert h.normal.shape == (4, 7, 3)
    assert h.metallic.shape == (4, 7)


def test_potential_occluders_culls_hull_walls():
    """Half-space occluder culling (intersect.potential_occluders): the 10
    convex-hull wall triangles + the 2 light-panel triangles of the Cornell
    box can never block a surface->light segment; the 24 inner-box
    triangles can. Sphere scene: only the light panel survives (ceiling
    verts sit above the light plane)."""
    from gpuraytracer_tpu.intersect import potential_occluders
    from gpuraytracer_tpu.scene import cornell_box, cornell_box_with_spheres
    from gpuraytracer_tpu.types import RenderConfig

    cfg = RenderConfig(width=16, height=8)
    s = cornell_box(resolution=(16, 8))
    m = potential_occluders(s, cfg)
    assert len(m) == s.triangles.num_triangles
    assert sum(m) == 24  # walls + light culled, box tris kept

    s2 = cornell_box_with_spheres(resolution=(16, 8))
    m2 = potential_occluders(s2, cfg)
    assert len(m2) == s2.triangles.num_triangles
    assert sum(m2) == 2  # only the light panel kept


def test_occluder_culling_preserves_render(cornell_scene):
    """Culled shadow loops change no visibility decision: kernel output with
    the mask equals the full loop to compilation-variance ulps, and still
    matches the oracle at the kernel-parity tolerance."""
    import jax
    import numpy as np
    from gpuraytracer_tpu.intersect import potential_occluders
    from gpuraytracer_tpu.ops.pallas_shade import render_path_decoupled_fused
    from gpuraytracer_tpu.render import render
    from gpuraytracer_tpu.types import RenderConfig

    cfg = RenderConfig(width=16, height=8, integrator="path", spp=2,
                       bounces=2, pixel_chunk=128)
    from gpuraytracer_tpu.scene import cornell_box
    s = cornell_box(resolution=(16, 8))
    occ = potential_occluders(s, cfg)
    a = np.asarray(render_path_decoupled_fused(s, cfg, occluders=occ))
    b = np.asarray(render_path_decoupled_fused(s, cfg))
    np.testing.assert_allclose(a, b, atol=5e-8, rtol=1e-6)
    oracle = np.asarray(render(s, cfg).hdr)
    np.testing.assert_allclose(a, oracle, atol=2e-5, rtol=1e-4)
