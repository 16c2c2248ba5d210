"""Golden-constant tests for scene construction (reference:
RTrace/scene.swift; constants cross-checked by hand)."""
import math

import numpy as np
import pytest

from gpuraytracer_tpu.scene import (cornell_box, cornell_box_with_spheres,
                                    make_square_light, photometric_luminance,
                                    rotated_box_vertices)


def test_cornell_box_triangle_count(cornell_scene):
    # 10 walls + 2 boxes x 12 + 2 light tris = 36 (createCornellBoxScene
    # appends 34, initCornellBox appends 2 more; scene.swift:55-59).
    assert cornell_scene.triangles.num_triangles == 36


def test_camera_constants(cornell_scene):
    cam = cornell_scene.camera
    np.testing.assert_allclose(np.asarray(cam.position), [0, 0, 9])
    d = np.asarray(cam.direction)
    expected = np.array([0, 0, -11.5]) / 11.5
    np.testing.assert_allclose(d, expected, atol=1e-6)
    assert float(cam.horizontal_fov) == pytest.approx(math.pi / 4)
    assert float(cam.ev100) == 5.0


def test_photometric_luminance():
    # (100 lm/W * 12 W) / (1 m^2) / pi = 381.97 cd/m^2, tinted warm white
    # (scene.swift:257-270).
    lum = photometric_luminance((1.0, 0.95, 0.9), 100.0, 12.0, 1.0, 1.0)
    base = 1200.0 / math.pi
    np.testing.assert_allclose(lum, [base, 0.95 * base, 0.9 * base], rtol=1e-6)


def test_light_constants(cornell_scene):
    light = cornell_scene.light
    np.testing.assert_allclose(np.asarray(light.center), [0, 2.49, 0])
    np.testing.assert_allclose(np.asarray(light.color), [1.0, 0.95, 0.9])
    assert float(light.width) == 1.0 and float(light.depth) == 1.0
    np.testing.assert_allclose(np.asarray(light.normal), [0, -1, 0])


def test_light_triangles_are_emissive(cornell_scene):
    em = np.asarray(cornell_scene.triangles.emissive)
    # Only the last two triangles emit, with emissive (1,1,1) (scene.swift:41).
    assert np.all(em[:34] == 0)
    np.testing.assert_allclose(em[34:], 1.0)


def test_wall_materials(cornell_scene):
    d = np.asarray(cornell_scene.triangles.diffuse)
    r = np.asarray(cornell_scene.triangles.roughness)
    m = np.asarray(cornell_scene.triangles.metallic)
    # Back wall white rough .8; left red rough .3; right green rough .8
    # (scene.swift:72-74).
    np.testing.assert_allclose(d[0], [0.9, 0.9, 0.9])
    np.testing.assert_allclose(d[2], [0.9, 0.0, 0.0])
    np.testing.assert_allclose(d[4], [0.0, 0.7, 0.0])
    assert r[2] == pytest.approx(0.3) and r[4] == pytest.approx(0.8)
    assert np.all(m[:34] == pytest.approx(0.05))
    # Boxes use diffuse-box material: rough .3 (scene.swift:75).
    assert np.all(r[10:34] == pytest.approx(0.3))


def test_rotated_box_vertices_round_trip():
    # Zero rotation at origin returns the raw corners.
    v = rotated_box_vertices((0, 0, 0), 2.0, 4.0, 6.0, 0.0)
    assert v.shape == (8, 3)
    np.testing.assert_allclose(v[0], [-1, -2, -3])
    np.testing.assert_allclose(v[6], [1, 2, 3])
    # Rotation preserves distances from center.
    v_rot = rotated_box_vertices((1, 2, 3), 2.0, 4.0, 6.0, 0.7)
    d0 = np.linalg.norm(v - 0, axis=1)
    d1 = np.linalg.norm(v_rot - np.array([1, 2, 3]), axis=1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)
    # Y-rotation keeps y coordinates.
    np.testing.assert_allclose(v_rot[:, 1] - 2.0, v[:, 1], atol=1e-6)


def test_box_vertex_positions_match_reference_math():
    # Tall box (scene.swift:141-155): center (-1, -2.5+1.4-0.05, -1.5),
    # rotation pi/2.4 about Y with the reference's (transposed) matrix.
    v = rotated_box_vertices((-1.0, -1.15, -1.5), 1.2, 2.8, 1.2,
                             math.pi / 2.4)
    c, s = math.cos(math.pi / 2.4), math.sin(math.pi / 2.4)
    base0 = np.array([-0.6, -1.4, -0.6])
    expected = np.array([
        c * base0[0] - s * base0[2],
        base0[1],
        s * base0[0] + c * base0[2],
    ]) + np.array([-1.0, -1.15, -1.5])
    np.testing.assert_allclose(v[0], expected, atol=1e-5)


def test_sphere_scene(sphere_scene):
    assert sphere_scene.triangles.num_triangles == 12  # 10 walls + 2 light
    assert sphere_scene.spheres.num_spheres == 2
    assert float(sphere_scene.spheres.radius[0]) == pytest.approx(0.9)
