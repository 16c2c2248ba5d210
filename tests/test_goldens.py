"""Committed golden renders (SURVEY.md §4.3, VERDICT r1 item 8): the CPU
jnp oracle must reproduce the .npy goldens under tests/goldens/ exactly
(same platform/seed ⇒ tight tolerance). Regenerate deliberately with
``JAX_PLATFORMS=cpu python tests/regen_goldens.py``."""
import os

import numpy as np
import pytest

from gpuraytracer_tpu.image import row_means
from gpuraytracer_tpu.render import render
from gpuraytracer_tpu.scene import cornell_box
from gpuraytracer_tpu.types import RenderConfig

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.fail(f"missing golden {name}; run tests/regen_goldens.py")
    return np.load(path)


@pytest.mark.smoke
def test_config1_full_image_golden():
    """BASELINE config 1: Cornell 256^2, 1 spp, direct lighting only —
    full-image allclose against the committed golden."""
    cfg = RenderConfig(width=256, height=256, integrator="direct", spp=1,
                       bounces=1, pixel_chunk=65536)
    scene = cornell_box(resolution=(256, 256))
    hdr = np.asarray(render(scene, cfg).hdr)
    np.testing.assert_allclose(hdr, _load("config1_hdr.npy"),
                               atol=1e-6, rtol=1e-5)


def test_path_512_row_means_golden():
    cfg = RenderConfig(width=512, height=512, integrator="path", spp=2,
                       bounces=3, pixel_chunk=65536)
    scene = cornell_box(resolution=(512, 512))
    rm = np.asarray(row_means(render(scene, cfg).hdr))
    np.testing.assert_allclose(rm, _load("path_512_rowmeans.npy"),
                               atol=1e-5, rtol=1e-4)


def test_mis_512_row_means_golden():
    cfg = RenderConfig(width=512, height=512, integrator="mis",
                       camera_rays=1, mis_samples=3, pixel_chunk=65536)
    scene = cornell_box(resolution=(512, 512))
    rm = np.asarray(row_means(render(scene, cfg).hdr))
    np.testing.assert_allclose(rm, _load("mis_512_rowmeans.npy"),
                               atol=1e-5, rtol=1e-4)
