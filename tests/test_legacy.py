"""Legacy-tier tests: sphere/box lights + the legacy MIS integrator
(shaders_old.metal:738-1409, SURVEY.md §2.2 last row)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu import sampling as smp
from gpuraytracer_tpu.render_legacy import render_legacy
from gpuraytracer_tpu.scene import legacy_cornell, make_box_lights, make_sphere_lights
from gpuraytracer_tpu.types import RenderConfig

_CFG = RenderConfig(width=24, height=24, integrator="legacy",
                    legacy_samples=6, legacy_bounces=2,
                    legacy_bounce_samples=3, pixel_chunk=576)


def test_box_light_pdf_matches_sampler_on_front_faces(rng):
    """For points outside the box sampling a *front-facing* face point, the
    slab-test pdf (calculateBoxLightPdf, shaders_old.metal:625-676) must agree
    with the area sampler's pdf (sampleBoxLight, :292-404): same face, same
    distance, same d^2/(A_total cos) measure."""
    center = jnp.array([0.0, 2.0, 0.0], jnp.float32)
    w, h, d = 1.0, 0.5, 2.0
    # Points well outside the box.
    pts = rng.normal(size=(256, 3)).astype(np.float32)
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 5.0
    pts = jnp.asarray(pts + np.array([0.0, 2.0, 0.0], np.float32))
    u3 = jnp.asarray(rng.random((256, 3)).astype(np.float32))

    direction, pdf_sample = smp.sample_box_light(center, w, h, d, pts, u3)
    pdf_dir = smp.box_light_pdf(center, w, h, d, pts, direction)

    # Reconstruct whether the sampled face was front-facing: the sampler's
    # pdf uses cos against the sampled face's own normal; front-facing means
    # a finite, small pdf. Filter to comfortably front-facing samples.
    pdf_s = np.asarray(pdf_sample)
    pdf_d = np.asarray(pdf_dir)
    front = pdf_s < 200.0  # back-facing gives pdf ~ d^2/1e-6
    assert front.mean() > 0.3
    rel = np.abs(pdf_d[front] - pdf_s[front]) / np.maximum(pdf_s[front], 1e-3)
    assert np.median(rel) < 1e-3
    assert (rel < 0.05).mean() > 0.95


def test_box_light_pdf_zero_on_miss():
    center = jnp.array([0.0, 2.0, 0.0], jnp.float32)
    point = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    away = jnp.array([[0.0, -1.0, 0.0]], jnp.float32)  # pointing away
    pdf = smp.box_light_pdf(center, 1.0, 0.5, 1.0, point, away)
    assert float(pdf[0]) == 0.0


def test_sphere_light_types_roundtrip():
    sl = make_sphere_lights([(0.0, 2.0, 0.0)], [0.3], [(1.0, 0.9, 0.8)])
    assert sl.num_lights == 1
    # Photometric: luminance = flux / (4 pi r^2) / pi, tinted.
    area = 4.0 * np.pi * 0.3 ** 2
    expect = (100.0 * 12.0) / area / np.pi
    np.testing.assert_allclose(np.asarray(sl.emitted_radiance)[0, 0],
                               expect, rtol=1e-5)
    bl = make_box_lights([(0.0, 2.0, 0.0)], [(1.0, 0.5, 2.0)], [(1.0, 1.0, 1.0)])
    assert bl.num_lights == 1
    area = 2.0 * (1.0 * 0.5 + 1.0 * 2.0 + 0.5 * 2.0)
    np.testing.assert_allclose(np.asarray(bl.emitted_radiance)[0, 0],
                               (100.0 * 12.0) / area / np.pi, rtol=1e-5)


@pytest.mark.parametrize("kind", ["sphere", "box", "square"])
def test_legacy_render_finite_and_lit(kind):
    scene = legacy_cornell(kind, resolution=(24, 24))
    out = jax.jit(lambda s: render_legacy(s, _CFG).hdr)(scene)
    a = np.asarray(out)
    assert a.shape == (24, 24, 3)
    assert np.isfinite(a).all()
    assert (a >= 0.0).all()
    assert a.max() > 0.0  # some pixel receives light


def test_legacy_sphere_light_directly_visible():
    """Camera rays that hit the emissive sphere return its radiance
    (intersectLight -> HitLight, shaders_old.metal:138-170)."""
    scene = legacy_cornell("sphere", resolution=(48, 48))
    out = np.asarray(jax.jit(
        lambda s: render_legacy(s, _CFG.replace(width=48, height=48)).hdr
    )(scene))
    # The sphere light sits at (0, 1.9, 0): upper-middle of the image.
    emitted = np.asarray(scene.sphere_lights.emitted_radiance)[0]
    hits = np.isclose(out[..., 0], emitted[0], rtol=1e-4).sum()
    assert hits > 0


def test_legacy_dispatch_via_render():
    from gpuraytracer_tpu.render import render
    scene = legacy_cornell("sphere", resolution=(16, 16))
    cfg = _CFG.replace(width=16, height=16, pixel_chunk=256)
    out = render(scene, cfg)
    assert np.isfinite(np.asarray(out.hdr)).all()


def test_legacy_grad_flows_to_light_and_spheres():
    """Radiance is differentiable w.r.t. sphere-light radiance and sphere
    centers through the legacy integrator (the inverse-rendering surface of
    the legacy tier)."""
    import dataclasses
    scene = legacy_cornell("sphere", resolution=(16, 16))
    cfg = _CFG.replace(width=16, height=16, pixel_chunk=256,
                       legacy_samples=3, legacy_bounces=1)

    def loss(emitted, centers):
        sl = dataclasses.replace(scene.sphere_lights, emitted_radiance=emitted)
        sp = dataclasses.replace(scene.spheres, center=centers)
        s = dataclasses.replace(scene, sphere_lights=sl, spheres=sp)
        return jnp.mean(render_legacy(s, cfg).hdr)

    g_em, g_c = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(scene.sphere_lights.emitted_radiance),
        jnp.asarray(scene.spheres.center))
    assert np.isfinite(np.asarray(g_em)).all()
    assert np.isfinite(np.asarray(g_c)).all()
    assert float(jnp.abs(g_em).sum()) > 0.0
