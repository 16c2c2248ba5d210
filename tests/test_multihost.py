"""Multi-process multi-host runtime exercise (SURVEY.md §4.5, VERDICT r1
item 5): launch TWO actual JAX processes on CPU with
jax.distributed.initialize, render across the global 2-device mesh, and
assert the cross-process gathered image equals the single-process render.

The single-process degrade path is covered in tests/test_parallel.py; this
file covers process_count > 1."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_and_gather(tmp_path):
    # (Worker hangs are bounded by the 420 s communicate() timeout below —
    # no pytest-timeout plugin in the image.)
    from gpuraytracer_tpu.render import render
    from gpuraytracer_tpu.scene import cornell_box
    from gpuraytracer_tpu.types import RenderConfig

    config = RenderConfig(width=64, height=32, integrator="path", spp=1,
                          bounces=2, pixel_chunk=1024)
    scene = cornell_box(resolution=(64, 32))
    expected = np.asarray(render(scene, config).hdr)
    expected_path = tmp_path / "expected.npy"
    np.save(expected_path, expected)

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i),
             str(expected_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, f"worker {i} output:\n{out}"
