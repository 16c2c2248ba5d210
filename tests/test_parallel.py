"""Sharded rendering on the 8-device virtual CPU mesh (SURVEY.md §4.5):
sharded == unsharded at fixed seeds, scene replicated, pixels sharded."""
import jax
import numpy as np
import pytest

from gpuraytracer_tpu.parallel.mesh import (RAY_AXIS, make_ray_mesh,
                                            make_sharded_renderer,
                                            render_path_sharded)
from gpuraytracer_tpu.render import render
from gpuraytracer_tpu.scene import cornell_box
from gpuraytracer_tpu.types import RenderConfig


@pytest.fixture(scope="module")
def scene():
    return cornell_box(resolution=(32, 16))


@pytest.fixture(scope="module")
def mesh():
    return make_ray_mesh()


def _cfg(**kw):
    base = dict(width=32, height=16, integrator="path", spp=2, bounces=2,
                pixel_chunk=512)
    base.update(kw)
    return RenderConfig(**base)


def test_mesh_has_8_devices(mesh):
    assert mesh.shape[RAY_AXIS] == 8


def test_sharded_matches_unsharded(scene, mesh):
    """RNG is a pure function of (pixel, sample, bounce, dim), so sharding
    the pixel axis cannot change the image (beyond fusion-order ulps)."""
    cfg = _cfg()
    ref = np.asarray(render(scene, cfg).hdr)
    sharded = np.asarray(render_path_sharded(scene, cfg, mesh))
    np.testing.assert_allclose(sharded, ref, atol=1e-6, rtol=1e-5)


def test_sharded_renderer_jit(scene, mesh):
    cfg = _cfg(spp=1)
    fn = make_sharded_renderer(cfg, mesh)
    a = np.asarray(fn(scene))
    b = np.asarray(fn(scene))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 32, 3)


def test_sharded_output_is_actually_sharded(scene, mesh):
    cfg = _cfg(spp=1)
    out = render_path_sharded(scene, cfg, mesh)
    # The flat pixel axis was sharded over 8 devices before the reshape.
    assert len(out.sharding.device_set) == 8


def test_indivisible_pixels_raise(scene, mesh):
    cfg = _cfg(width=33, height=9)  # 297 pixels, not divisible by 8
    with pytest.raises(ValueError):
        render_path_sharded(scene, cfg, mesh)


def test_gradient_through_shard_map(scene, mesh):
    """Parameter gradients (replicated scene) survive the shard_map: grad of
    mean radiance w.r.t. light color is positive and finite."""
    import dataclasses
    import jax.numpy as jnp

    cfg = _cfg(spp=1, bounces=1)

    def mean_radiance(light_color):
        s = dataclasses.replace(
            scene, light=dataclasses.replace(scene.light, color=light_color))
        return jnp.mean(render_path_sharded(s, cfg, mesh))

    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(mean_radiance))(jnp.asarray(scene.light.color))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.all(g > 0)  # brighter light -> brighter image, all channels


def test_multihost_single_process_degrade(scene, mesh):
    """Single-process mode: init is a no-op, gather returns the local array,
    barrier returns immediately."""
    from gpuraytracer_tpu.parallel import multihost as mh

    assert mh.init_distributed() is False  # no coordinator configured
    assert mh.is_primary()
    cfg = _cfg(spp=1)
    out = render_path_sharded(scene, cfg, mesh)
    img = mh.gather_image(out)
    assert img.shape == (cfg.height, cfg.width, 3)
    assert np.all(np.isfinite(img))
    mh.sync_hosts()  # no-op at process_count == 1
