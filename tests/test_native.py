"""Native C++ runtime vs Python/jnp fallbacks."""
import numpy as np
import pytest

from gpuraytracer_tpu import native
from gpuraytracer_tpu import image as img

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_tonemap_matches_python(rng):
    hdr = rng.random((17, 23, 3)).astype(np.float32) * 5.0
    got = native.tonemap(hdr, 2.0, 2.2)
    want = img.tonemap(hdr, 2.0, 2.2)
    # uint8 rounding: allow off-by-one from float ordering differences.
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_png_roundtrip(rng, tmp_path):
    rgb = (rng.random((31, 19, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "native.png")
    native.write_png(path, rgb)
    back = img.read_png(path)
    np.testing.assert_array_equal(back, rgb)


def test_png_rgba(rng, tmp_path):
    rgba = (rng.random((8, 8, 4)) * 255).astype(np.uint8)
    path = str(tmp_path / "native4.png")
    native.write_png(path, rgba)
    back = img.read_png(path)
    np.testing.assert_array_equal(back, rgba)


def test_compile_triangles_matches_jnp(cornell_scene):
    import jax.numpy as jnp
    from gpuraytracer_tpu.intersect import compile_scene
    verts = np.asarray(cornell_scene.triangles.verts)
    out11, c2 = native.compile_triangles(verts)
    ref = compile_scene(cornell_scene.triangles, lane_pad=1)
    np.testing.assert_allclose(out11[:, 0:3], np.asarray(ref.n), atol=1e-5)
    np.testing.assert_allclose(out11[:, 3], np.asarray(ref.c0), atol=1e-5)
    np.testing.assert_allclose(out11[:, 4:7], np.asarray(ref.s1), atol=1e-4)
    np.testing.assert_allclose(out11[:, 7], np.asarray(ref.c1), atol=1e-4)
    np.testing.assert_allclose(out11[:, 8:11], np.asarray(ref.s2), atol=1e-4)
    np.testing.assert_allclose(c2, np.asarray(ref.c2), atol=1e-4)


def test_halton_table_matches_jnp():
    import jax.numpy as jnp
    from gpuraytracer_tpu import sampling as smp
    for d in [0, 1, 5]:
        got = native.halton_table(7, 64, d)
        want = np.asarray(smp.halton(jnp.arange(7, 71, dtype=jnp.uint32), d))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_row_means_matches_numpy(rng):
    hdr = rng.random((9, 33, 3)).astype(np.float32)
    got = native.row_means(hdr)
    np.testing.assert_allclose(got, hdr.mean(axis=1), rtol=1e-6)
