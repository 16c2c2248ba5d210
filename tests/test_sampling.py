"""Property tests for samplers, PRNG and PDFs (SURVEY.md §4.1)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu import sampling as smp


# --- hash PRNG --------------------------------------------------------------

def test_hash_matches_scalar_reference():
    """Cross-check the xorshift-multiply hash against a direct Python
    evaluation of the reference algorithm (sampling.metal:68-75)."""
    def ref_hash(x):
        M = 0xFFFFFFFF
        x = (x ^ (x >> 16)) & M
        x = (x * 0x7FEB352D) & M
        x = (x ^ (x >> 15)) & M
        x = (x * 0x846CA68B) & M
        x = (x ^ (x >> 16)) & M
        return x

    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(smp.hash_u32(jnp.asarray(xs)))
    want = np.array([ref_hash(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_random_float_range():
    seeds = jnp.arange(10000, dtype=jnp.uint32)
    u = np.asarray(smp.random_float(seeds))
    assert np.all(u >= 0) and np.all(u < 1)
    assert abs(u.mean() - 0.5) < 0.02  # roughly uniform


# --- Halton -----------------------------------------------------------------

def ref_halton(i, b):
    f, r = 1.0, 0.0
    while i > 0:
        f /= b
        r += f * (i % b)
        i //= b
    return r


@pytest.mark.parametrize("d", [0, 1, 2, 5, 23])
def test_halton_matches_reference(d):
    b = smp.PRIMES[d]
    idx = np.array([0, 1, 2, 3, 17, 100, 12345, 2**20 + 7], np.uint32)
    got = np.asarray(smp.halton(jnp.asarray(idx), d))
    want = np.array([ref_halton(int(i), b) for i in idx], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_halton_low_discrepancy():
    # Star-discrepancy-ish check: base-2 Halton of N points fills [0,1)
    # more evenly than the worst case; bin counts within 2x of uniform.
    n = 1024
    u = np.asarray(smp.halton(jnp.arange(n, dtype=jnp.uint32), 0))
    counts, _ = np.histogram(u, bins=16, range=(0, 1))
    assert counts.min() >= n // 16 - 1 and counts.max() <= n // 16 + 1


def test_radical_inverse_2():
    got = np.asarray(smp.radical_inverse_2(jnp.arange(8, dtype=jnp.uint32)))
    want = np.array([0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875])
    np.testing.assert_allclose(got, want, atol=1e-7)
    # Base-2 Halton and radical inverse agree.
    idx = jnp.arange(64, dtype=jnp.uint32)
    np.testing.assert_allclose(
        np.asarray(smp.halton(idx, 0)),
        np.asarray(smp.radical_inverse_2(idx)), atol=1e-6)


def test_hammersley():
    h = np.asarray(smp.hammersley_2d(jnp.arange(16, dtype=jnp.uint32), 16))
    np.testing.assert_allclose(h[:, 0], np.arange(16) / 16.0, atol=1e-7)
    assert smp.next_power_of_two(100) == 128
    assert smp.next_power_of_two(0) == 1
    assert smp.next_power_of_two(64) == 64


# --- hemisphere samplers ----------------------------------------------------

def _uniform_u2(n, seed=0):
    k = jax.random.key(seed)
    return jax.random.uniform(k, (n, 2))


def test_cosine_hemisphere_y_up_distribution():
    u = _uniform_u2(200000)
    d = np.asarray(smp.cosine_hemisphere_y_up(u))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.all(d[:, 1] >= 0)  # y-up hemisphere
    # E[cos(theta)] for pdf cos/pi is 2/3.
    assert d[:, 1].mean() == pytest.approx(2.0 / 3.0, abs=5e-3)


def test_cosine_pdf_integrates_to_one():
    # Monte-Carlo: integral over hemisphere of cos/pi dOmega = 1, estimated
    # with uniform hemisphere sampling (pdf 1/2pi).
    n = 200000
    k = jax.random.key(3)
    normal = jnp.array([0.0, 0.0, 1.0])
    u = jax.random.uniform(k, (n, 2))
    dirs = smp.uniform_hemisphere_dir(jnp.broadcast_to(normal, (n, 3)), u)
    pdf = smp.cosine_pdf(normal, dirs)
    est = float(jnp.mean(pdf) * 2 * math.pi)
    assert est == pytest.approx(1.0, abs=2e-2)


def test_align_hemisphere_preserves_up():
    n = 5000
    key = jax.random.key(7)
    normals = jax.random.normal(key, (n, 3))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    local = smp.cosine_hemisphere_y_up(_uniform_u2(n))
    world = np.asarray(smp.align_hemisphere_with_normal(local, normals))
    cosines = np.sum(world * np.asarray(normals), axis=-1)
    np.testing.assert_allclose(cosines, np.asarray(local[:, 1]), atol=1e-4)


def test_build_orthonormal_basis():
    normals = jnp.asarray(np.array(
        [[0, 1, 0], [1, 0, 0], [0, 0, -1], [0.95, 0.1, 0.2]], np.float32))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    t, b = smp.build_orthonormal_basis(normals)
    t, b, n = np.asarray(t), np.asarray(b), np.asarray(normals)
    np.testing.assert_allclose(np.sum(t * n, -1), 0, atol=1e-6)
    np.testing.assert_allclose(np.sum(b * n, -1), 0, atol=1e-6)
    np.testing.assert_allclose(np.sum(t * b, -1), 0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1, atol=1e-6)


# --- GGX / VNDF -------------------------------------------------------------

def test_ggx_d_normalization():
    """Integral over hemisphere of D(h) cos(h) dOmega = 1 for true GGX with
    alpha = a. (The reference feeds roughness, not roughness^2; the identity
    holds for whatever 'a' is fed.)"""
    a = 0.5
    n = 400000
    normal = jnp.array([0.0, 0.0, 1.0])
    u = _uniform_u2(n, seed=11)
    h = smp.uniform_hemisphere_dir(jnp.broadcast_to(normal, (n, 3)), u)
    noh = jnp.maximum(smp.dot(normal, h), 0.0)
    d = smp.d_ggx(noh, jnp.float32(a))
    est = float(jnp.mean(d * noh) * 2 * math.pi)
    assert est == pytest.approx(1.0, abs=5e-2)


def test_vndf_sample_reflects_about_visible_normal():
    n = 20000
    normal = jnp.array([0.0, 0.0, 1.0])
    view = smp.normalize(jnp.array([0.3, -0.2, 0.8]))
    u = _uniform_u2(n, seed=5)
    d = smp.vndf_dir(jnp.broadcast_to(view, (n, 3)),
                     jnp.broadcast_to(normal, (n, 3)),
                     jnp.full((n,), 0.4), u)
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # Half vectors must lie in the upper hemisphere.
    h = np.asarray(view)[None] + d
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)
    assert np.all(h @ np.asarray(normal) > -1e-4)


def test_vndf_pdf_positive_and_finite():
    normal = jnp.array([0.0, 0.0, 1.0])
    view = smp.normalize(jnp.array([0.2, 0.1, 0.9]))
    u = _uniform_u2(1000, seed=9)
    d = smp.vndf_dir(jnp.broadcast_to(view, (1000, 3)),
                     jnp.broadcast_to(normal, (1000, 3)),
                     jnp.full((1000,), 0.3), u)
    pdf = np.asarray(smp.vndf_pdf(jnp.broadcast_to(view, (1000, 3)),
                                  jnp.broadcast_to(normal, (1000, 3)),
                                  d, jnp.full((1000,), 0.3)))
    assert np.all(np.isfinite(pdf)) and np.all(pdf >= 0)


# --- MIS heuristics ---------------------------------------------------------

def test_power_heuristic_partition_of_unity():
    """With beta=1 and equal sample counts the three weights sum to ~1
    (up to the reference's 1e-6 epsilon)."""
    p = np.abs(np.random.default_rng(0).normal(size=(100, 3))).astype(np.float32) + 0.1
    w1 = smp.power_heuristic_3(p[:, 0], p[:, 1], p[:, 2], 100, 1.0)
    w2 = smp.power_heuristic_3(p[:, 1], p[:, 2], p[:, 0], 100, 1.0)
    w3 = smp.power_heuristic_3(p[:, 2], p[:, 0], p[:, 1], 100, 1.0)
    total = np.asarray(w1 + w2 + w3)
    np.testing.assert_allclose(total, 1.0, atol=1e-4)
    assert np.all(total <= 1.0 + 1e-5)


def test_balanced_heuristic_zero_pdf():
    assert float(smp.balanced_heuristic_3(0.0, 1.0, 2.0)) == 0.0


# --- light sampling ---------------------------------------------------------

def test_sample_area_light_falloff():
    center = jnp.array([0.0, 2.49, 0.0])
    color = jnp.array([1.0, 0.95, 0.9])
    normal = jnp.array([0.0, -1.0, 0.0])
    pos = jnp.array([[0.0, 0.0, 0.0]])
    u = jnp.array([[0.5, 0.5]])  # center sample
    c, d, dist = smp.sample_area_light(center, color, normal, pos, u)
    assert float(dist[0]) == pytest.approx(2.49, abs=1e-5)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 1, 0], atol=1e-6)
    # falloff: color / d^2 * cos(0) with cos = dot(-d, n) = 1.
    np.testing.assert_allclose(
        np.asarray(c[0]), np.asarray(color) / 2.49**2, rtol=1e-5)


def test_square_light_pdf_at_center():
    center = jnp.array([0.0, 2.49, 0.0])
    normal = jnp.array([0.0, -1.0, 0.0])
    origin = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([0.0, 1.0, 0.0])
    pdf = float(smp.square_light_pdf(origin, center, 1.0, 1.0, normal,
                                     direction))
    assert pdf == pytest.approx(2.49**2 / (1.0 + 1e-6), rel=1e-4)


def test_sphere_light_sampler_within_cone():
    center = jnp.array([0.0, 5.0, 0.0])
    point = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0]), (1000, 3))
    u = _uniform_u2(1000, seed=21)
    d, pdf = smp.sample_sphere_light(center, 1.0, point, u)
    cos_to_center = np.asarray(smp.dot(d, smp.normalize(center)))
    sin_max = 1.0 / 5.0
    cos_max = math.sqrt(1 - sin_max**2)
    assert np.all(cos_to_center >= cos_max - 1e-4)
    expected_pdf = 1.0 / (2 * math.pi * (1 - cos_max))
    np.testing.assert_allclose(np.asarray(pdf), expected_pdf, rtol=1e-4)


def test_box_light_sampler_on_surface():
    center = jnp.array([1.0, 2.0, 3.0])
    point = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0]), (2000, 3))
    k = jax.random.key(13)
    u3 = jax.random.uniform(k, (2000, 3))
    d, pdf = smp.sample_box_light(center, 1.0, 2.0, 0.5, point, u3)
    assert np.all(np.isfinite(np.asarray(pdf)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               atol=1e-5)


# --- camera -----------------------------------------------------------------

def test_camera_ray_center_pixel():
    pos = jnp.array([0.0, 0.0, 9.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    up = jnp.array([0.0, 1.0, 0.0])
    px = jnp.array([400], jnp.int32)
    py = jnp.array([300], jnp.int32)
    jitter = jnp.array([[0.0, 0.0]])
    o, d = smp.generate_camera_ray(pos, direction, up, (800, 600),
                                   jnp.float32(math.pi / 4), px, py, jitter)
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 9])
    # Exactly center => straight ahead (s=0, t=0).
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-6)


def test_camera_integer_aspect_quirk():
    """800x600 with integer aspect => halfHeight == halfWidth (aspect 1.0,
    sampling.metal:132); proper aspect would give 0.75 ratio."""
    pos = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    up = jnp.array([0.0, 1.0, 0.0])
    jitter = jnp.array([[0.0, 0.0]])
    px, py = jnp.array([800], jnp.int32), jnp.array([0], jnp.int32)
    _, d_int = smp.generate_camera_ray(pos, direction, up, (800, 600),
                                       jnp.float32(math.pi / 4), px, py,
                                       jitter, integer_aspect=True)
    _, d_frac = smp.generate_camera_ray(pos, direction, up, (800, 600),
                                        jnp.float32(math.pi / 4), px, py,
                                        jitter, integer_aspect=False)
    assert not np.allclose(np.asarray(d_int), np.asarray(d_frac))


def test_hash_random_2d_deterministic():
    a = smp.hash_random_2d(jnp.array([5]), jnp.array([7]), jnp.uint32(3))
    b = smp.hash_random_2d(jnp.array([5]), jnp.array([7]), jnp.uint32(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    u = np.asarray(a)
    assert np.all(u >= 0) and np.all(u < 1)


def test_shift_random_points_wraps():
    """2u mod 1 per component (shiftRandomPoints, shaders.metal:87-98)."""
    u = jnp.array([[0.1, 0.6], [0.5, 0.49999997], [0.0, 0.75]])
    out = np.asarray(smp.shift_random_points(u))
    np.testing.assert_allclose(out, [[0.2, 0.2], [0.0, 0.99999994],
                                     [0.0, 0.5]], atol=1e-7)
    assert np.all(out >= 0.0) and np.all(out < 1.0)
    # property: doubling preserves uniformity bounds on a dense grid
    g = jnp.stack([jnp.linspace(0, 0.999, 64)] * 2, axis=-1)
    og = np.asarray(smp.shift_random_points(g))
    assert og.min() >= 0.0 and og.max() < 1.0
