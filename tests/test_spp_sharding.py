"""Sample-axis (spp) sharding tests — SURVEY.md §2.4 sequence-parallel
analog. Runs on the 8 virtual CPU devices from conftest."""
import jax
import numpy as np
import pytest

from gpuraytracer_tpu.parallel.mesh import (RAY_AXIS, SPP_AXIS,
                                            make_ray_spp_mesh,
                                            render_path_spp_sharded)
from gpuraytracer_tpu.render import render
from gpuraytracer_tpu.types import RenderConfig

_CFG = RenderConfig(width=16, height=16, integrator="path", spp=8, bounces=2,
                    pixel_chunk=256)


@pytest.fixture(scope="module")
def scene():
    from gpuraytracer_tpu.scene import cornell_box
    return cornell_box(resolution=(16, 16))


def test_spp_only_mesh_matches_unsharded(scene):
    mesh = jax.make_mesh((4,), (SPP_AXIS,), devices=jax.devices()[:4])
    sharded = np.asarray(render_path_spp_sharded(scene, _CFG, mesh))
    single = np.asarray(render(scene, _CFG).hdr)
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)


def test_ray_spp_2d_mesh_matches_unsharded(scene):
    mesh = make_ray_spp_mesh(2, 4)
    assert mesh.shape[RAY_AXIS] == 2 and mesh.shape[SPP_AXIS] == 4
    sharded = np.asarray(render_path_spp_sharded(scene, _CFG, mesh))
    single = np.asarray(render(scene, _CFG).hdr)
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)


def test_spp_sharding_jits(scene):
    mesh = jax.make_mesh((2,), (SPP_AXIS,), devices=jax.devices()[:2])
    fn = jax.jit(lambda s: render_path_spp_sharded(s, _CFG, mesh))
    out = np.asarray(fn(scene))
    assert np.isfinite(out).all()


def test_spp_indivisible_raises(scene):
    mesh = jax.make_mesh((3,), (SPP_AXIS,), devices=jax.devices()[:3])
    with pytest.raises(ValueError):
        render_path_spp_sharded(scene, _CFG, mesh)
