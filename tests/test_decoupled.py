"""Decoupled trace+replay parity (ops/decoupled.py): values and gradients
must match the jnp oracle exactly (the replay reuses the kernel's discrete
decisions and random draws, so there is no Monte-Carlo slack)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.ops.decoupled import (render_path_decoupled,
                                            shade_replay, trace_records)
from gpuraytracer_tpu.render import render
from gpuraytracer_tpu.scene import cornell_box
from gpuraytracer_tpu.types import RenderConfig


@pytest.fixture(scope="module")
def scene():
    return cornell_box(resolution=(32, 16))


def _cfg(**kw):
    base = dict(width=32, height=16, integrator="path", spp=4, bounces=3,
                pixel_chunk=512, replay_sample_chunk=2)
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def traced(scene):
    cfg = _cfg()
    hdr, aux = trace_records(scene, cfg, interpret=True)
    return cfg, hdr, aux


def test_trace_hdr_matches_oracle(scene, traced):
    cfg, hdr, _ = traced
    oracle = np.asarray(render(scene, cfg).hdr)
    np.testing.assert_allclose(np.asarray(hdr), oracle, atol=2e-5, rtol=1e-4)


def test_replay_matches_oracle(scene, traced):
    cfg, _, aux = traced
    oracle = np.asarray(render(scene, cfg).hdr)
    replay = np.asarray(shade_replay(scene, aux, cfg))
    np.testing.assert_allclose(replay, oracle, atol=2e-5, rtol=1e-4)


def test_replay_chunk_size_is_value_invariant(scene, traced):
    cfg, _, aux = traced
    a = np.asarray(shade_replay(scene, aux, cfg))
    b = np.asarray(shade_replay(scene, aux,
                                cfg.replace(replay_sample_chunk=1)))
    c = np.asarray(shade_replay(scene, aux,
                                cfg.replace(replay_sample_chunk=4)))
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(a, c, atol=1e-6, rtol=1e-6)


def test_replay_material_grads_match_oracle(scene, traced):
    cfg, _, aux = traced

    def loss_rep(color):
        s = dataclasses.replace(
            scene, light=dataclasses.replace(scene.light, color=color))
        return jnp.mean(shade_replay(s, aux, cfg))

    def loss_orc(color):
        s = dataclasses.replace(
            scene, light=dataclasses.replace(scene.light, color=color))
        return jnp.mean(render(s, cfg).hdr)

    c = jnp.asarray(scene.light.color)
    g_r = np.asarray(jax.grad(loss_rep)(c))
    g_o = np.asarray(jax.grad(loss_orc)(c))
    np.testing.assert_allclose(g_r, g_o, atol=1e-7, rtol=1e-5)


def test_replay_geometry_grads_match_oracle(scene, traced):
    """Triangle-vertex gradients flow through the recorded plane equations
    and agree with AD through the full intersection (both treat the discrete
    winner as constant)."""
    cfg, _, aux = traced

    def loss_rep(verts):
        tri = dataclasses.replace(scene.triangles, verts=verts)
        return jnp.mean(shade_replay(
            dataclasses.replace(scene, triangles=tri), aux, cfg))

    def loss_orc(verts):
        tri = dataclasses.replace(scene.triangles, verts=verts)
        return jnp.mean(render(
            dataclasses.replace(scene, triangles=tri), cfg).hdr)

    v = jnp.asarray(scene.triangles.verts)
    g_r = np.asarray(jax.grad(loss_rep)(v))
    g_o = np.asarray(jax.grad(loss_orc)(v))
    np.testing.assert_allclose(g_r, g_o, atol=5e-6, rtol=1e-4)


def test_render_path_decoupled_end_to_end(scene):
    cfg = _cfg(spp=2)
    oracle = np.asarray(render(scene, cfg).hdr)
    out = np.asarray(render_path_decoupled(scene, cfg))
    np.testing.assert_allclose(out, oracle, atol=2e-5, rtol=1e-4)


def test_sphere_scene_replay_and_center_grads():
    """Sphere prims flow through records: values match the oracle and
    sphere-center gradients (config-4 geometry workload) agree with AD
    through the full quadratic intersection."""
    from gpuraytracer_tpu.scene import cornell_box_with_spheres

    scene = cornell_box_with_spheres(resolution=(32, 16))
    cfg = _cfg(spp=2)
    oracle = np.asarray(render(scene, cfg).hdr)
    hdr, aux = trace_records(scene, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(hdr), oracle, atol=2e-5, rtol=1e-4)
    replay = np.asarray(shade_replay(scene, aux, cfg))
    np.testing.assert_allclose(replay, oracle, atol=2e-5, rtol=1e-4)

    def loss_rep(center):
        sp = dataclasses.replace(scene.spheres, center=center)
        return jnp.mean(shade_replay(dataclasses.replace(scene, spheres=sp),
                                     aux, cfg))

    def loss_orc(center):
        sp = dataclasses.replace(scene.spheres, center=center)
        return jnp.mean(render(dataclasses.replace(scene, spheres=sp),
                               cfg).hdr)

    c = jnp.asarray(scene.spheres.center)
    g_r = np.asarray(jax.grad(loss_rep)(c))
    g_o = np.asarray(jax.grad(loss_orc)(c))
    np.testing.assert_allclose(g_r, g_o, atol=5e-6, rtol=1e-4)
