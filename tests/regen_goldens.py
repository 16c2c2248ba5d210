"""Regenerate the committed golden renders under tests/goldens/.

Run from the repo root on CPU (the goldens are the CPU jnp oracle's output;
kernel parity vs the oracle is asserted separately in test_pallas*):

    JAX_PLATFORMS=cpu python tests/regen_goldens.py

Goldens (SURVEY.md §4.3):
  config1_hdr.npy        BASELINE config 1: Cornell 256x256, 1 spp, direct
                         lighting only — full [H, W, 3] f32 image.
  path_512_rowmeans.npy  variant-B path tracer, 512x512, 2 spp, 3 bounces —
                         per-row mean radiance [512, 3] (the reference's
                         writeDebugArrayToFile statistic,
                         computeShader.swift:211-230).
  mis_512_rowmeans.npy   variant-A MIS, 512x512, 1 camera ray, 3 MIS
                         samples — per-row mean of the raw accumulator.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from gpuraytracer_tpu.image import row_means
    from gpuraytracer_tpu.render import render
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "goldens")
    os.makedirs(out_dir, exist_ok=True)

    # Config 1: full-image golden.
    cfg1 = RenderConfig(width=256, height=256, integrator="direct", spp=1,
                        bounces=1, pixel_chunk=65536)
    scene = cornell_box(resolution=(256, 256))
    hdr = np.asarray(render(scene, cfg1).hdr, np.float32)
    np.save(os.path.join(out_dir, "config1_hdr.npy"), hdr)
    print("config1_hdr.npy", hdr.shape, float(hdr.mean()))

    # 512^2 row-means goldens (stochastic configs -> image statistics).
    scene512 = cornell_box(resolution=(512, 512))
    cfg_p = RenderConfig(width=512, height=512, integrator="path", spp=2,
                         bounces=3, pixel_chunk=65536)
    rm_p = np.asarray(row_means(render(scene512, cfg_p).hdr), np.float32)
    np.save(os.path.join(out_dir, "path_512_rowmeans.npy"), rm_p)
    print("path_512_rowmeans.npy", rm_p.shape, float(rm_p.mean()))

    cfg_m = RenderConfig(width=512, height=512, integrator="mis",
                         camera_rays=1, mis_samples=3, pixel_chunk=65536)
    rm_m = np.asarray(row_means(render(scene512, cfg_m).hdr), np.float32)
    np.save(os.path.join(out_dir, "mis_512_rowmeans.npy"), rm_m)
    print("mis_512_rowmeans.npy", rm_m.shape, float(rm_m.mean()))


if __name__ == "__main__":
    main()
