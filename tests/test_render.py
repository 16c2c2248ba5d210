"""Integrator tests: physical sanity, determinism, golden statistics
(SURVEY.md §4.3 — image-space row means, the reference's debugOutput trick)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.render import (render, render_jit, camera_exposure,
                                     reinhard, tonemap_mis)
from gpuraytracer_tpu.scene import cornell_box
from gpuraytracer_tpu.types import RenderConfig


@pytest.fixture(scope="module")
def small_scene():
    return cornell_box(resolution=(32, 24))


def _cfg(**kw):
    base = dict(width=32, height=24, integrator="path", spp=4, bounces=3,
                pixel_chunk=768)
    base.update(kw)
    return RenderConfig(**base)


def test_path_render_shapes_and_range(small_scene):
    out = render_jit(small_scene, _cfg())
    hdr = np.asarray(out.hdr)
    assert hdr.shape == (24, 32, 3)
    assert np.all(np.isfinite(hdr)) and np.all(hdr >= 0)
    assert hdr.max() > 0  # something is lit


def test_path_render_deterministic(small_scene):
    a = np.asarray(render_jit(small_scene, _cfg()).hdr)
    b = np.asarray(render_jit(small_scene, _cfg()).hdr)
    np.testing.assert_array_equal(a, b)


def test_path_seed_changes_image(small_scene):
    a = np.asarray(render_jit(small_scene, _cfg(seed=0)).hdr)
    b = np.asarray(render_jit(small_scene, _cfg(seed=1)).hdr)
    assert not np.array_equal(a, b)
    # but the mean radiance is stable-ish across seeds
    assert abs(a.mean() - b.mean()) < 0.35 * max(a.mean(), b.mean())


def test_direct_equals_path_with_one_bounce(small_scene):
    d = np.asarray(render(small_scene, _cfg(integrator="direct")).hdr)
    p1 = np.asarray(render(small_scene, _cfg(bounces=1)).hdr)
    np.testing.assert_array_equal(d, p1)


def test_more_bounces_at_least_as_bright(small_scene):
    """Extra indirect bounces only add (non-light-overwrite paths) energy on
    average."""
    p1 = np.asarray(render(small_scene, _cfg(spp=16, bounces=1)).hdr).mean()
    p3 = np.asarray(render(small_scene, _cfg(spp=16, bounces=3)).hdr).mean()
    assert p3 > p1 * 0.95  # indirect adds energy modulo light-overwrite quirk


def test_path_chunking_invariance(small_scene):
    """Pixel chunk size is a pure performance knob: same math, so results
    agree to float-fusion noise (different XLA fusions reassociate a few
    ulps; sampling decisions are identical by construction)."""
    a = np.asarray(render_jit(small_scene, _cfg(pixel_chunk=768)).hdr)
    b = np.asarray(render_jit(small_scene, _cfg(pixel_chunk=128)).hdr)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_left_wall_red_right_wall_green(small_scene):
    """Color bleeding sanity: left third of the image sees the red wall,
    right third the green wall."""
    hdr = np.asarray(render(small_scene, _cfg(spp=32, bounces=2)).hdr)
    left = hdr[:, :8].mean(axis=(0, 1))
    right = hdr[:, -8:].mean(axis=(0, 1))
    assert left[0] > left[1]  # red dominates on the left
    assert right[1] > right[0]  # green dominates on the right


def test_mis_render_runs_and_tonemaps(small_scene):
    cfg = _cfg(integrator="mis", camera_rays=2, mis_samples=6)
    out = render_jit(small_scene, cfg)
    assert out.ldr is not None
    ldr = np.asarray(out.ldr)
    assert ldr.shape == (24, 32, 3)
    assert np.all(ldr >= 0) and np.all(ldr <= 1)
    assert np.all(np.isfinite(np.asarray(out.hdr)))
    # The ceiling light region (top middle rows) is the brightest thing.
    assert ldr.max() > 0.3


def test_mis_deterministic(small_scene):
    cfg = _cfg(integrator="mis", camera_rays=1, mis_samples=3)
    a = np.asarray(render_jit(small_scene, cfg).hdr)
    b = np.asarray(render_jit(small_scene, cfg).hdr)
    np.testing.assert_array_equal(a, b)


def test_camera_exposure_and_reinhard():
    # 1/(1.2 * 2^5) = 1/38.4 (shaders.metal:145-150 at ev100=5).
    assert float(camera_exposure(jnp.float32(5.0))) == pytest.approx(1 / 38.4)
    r = np.asarray(reinhard(jnp.array([0.0, 1.0, 1e6])))
    np.testing.assert_allclose(r, [0.0, 0.5, 1.0], atol=1e-4)


def test_tonemap_mis_matches_reference_math():
    acc = jnp.full((2, 2, 3), 38.4)  # exposed = 38.4/2/38.4 = 0.5
    ldr = np.asarray(tonemap_mis(acc, 2, jnp.float32(5.0)))
    want = (0.5 / 1.5) ** (1 / 2.2)
    np.testing.assert_allclose(ldr, want, rtol=1e-5)


def test_render_rejects_unknown_integrator(small_scene):
    with pytest.raises(ValueError):
        render(small_scene, _cfg(integrator="bogus"))


def test_golden_row_means_direct(small_scene):
    """Golden statistics: row means of the 1-spp direct render, committed as
    literals. Guards against silent behavior drift in camera/NEE/shadow math.
    (Regenerate with tests/regen_goldens.py if a deliberate change is made.)"""
    cfg = _cfg(spp=1, integrator="direct")
    hdr = np.asarray(render(small_scene, cfg).hdr)
    got = hdr.mean(axis=(1, 2))  # [24] row means
    assert got.shape == (24,)
    assert np.all(np.isfinite(got))
    # Committed golden (CPU, jax 0.9, seed 0). Row 3 contains the visible
    # emissive light panel (emissive overwrite = 1.0); mid rows are the lit
    # walls; the top two rows see the unlit ceiling (light faces down).
    golden = np.array([
        0.0, 0.0, 0.0002, 0.0627, 0.0010, 0.0025, 0.0090, 0.0156, 0.0193,
        0.0201, 0.0199, 0.0193, 0.0157, 0.0120, 0.0113, 0.0092, 0.0096,
        0.0060, 0.0038, 0.0108, 0.0137, 0.0129, 0.0152, 0.0019,
    ], np.float32)
    np.testing.assert_allclose(got, golden, atol=2e-4)
