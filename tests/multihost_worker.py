"""Worker process for tests/test_multihost.py — NOT a test module.

Runs one JAX process of a 2-process CPU cluster (jax.distributed), renders
its shard of the Cornell box through the shard_map renderer over the GLOBAL
2-device mesh, gathers the full image cross-process, and checks it against
the single-process reference rendered by the parent.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> <expected.npy>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly one local CPU device

coordinator, num_procs, proc_id, expected_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gpuraytracer_tpu.parallel.mesh import make_ray_mesh, make_sharded_renderer  # noqa: E402
from gpuraytracer_tpu.parallel.multihost import (gather_image, init_distributed,  # noqa: E402
                                                 is_primary, sync_hosts)
from gpuraytracer_tpu.scene import cornell_box  # noqa: E402
from gpuraytracer_tpu.types import RenderConfig  # noqa: E402

assert init_distributed(coordinator, num_procs, proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert jax.process_index() == proc_id
assert is_primary() == (proc_id == 0)
assert len(jax.devices()) == num_procs          # global devices
assert len(jax.local_devices()) == 1            # one per process

config = RenderConfig(width=64, height=32, integrator="path", spp=1,
                      bounces=2, pixel_chunk=1024)
scene = cornell_box(resolution=(64, 32))

mesh = make_ray_mesh(jax.devices())             # 2-device global mesh
renderer = make_sharded_renderer(config, mesh)
hdr = renderer(scene)                           # global sharded [H, W, 3]
assert not hdr.is_fully_addressable             # truly cross-process

img = gather_image(hdr)                         # process_allgather over DCN
expected = np.load(expected_path)
np.testing.assert_allclose(img, expected, atol=2e-6, rtol=1e-5)

sync_hosts("test-done")
print(f"WORKER_OK {proc_id}", flush=True)
