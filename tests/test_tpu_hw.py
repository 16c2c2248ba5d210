"""Real-TPU hardware tier (`pytest -m tpu`): validates numerics that the
CPU/interpret CI tier cannot reach — the DEFAULT-precision bf16 chunk-split
matmul accumulation in the hand-written Pallas backwards rounds on real MXUs
but is exact in the interpreter's f32 (ADVICE r3).

Runs in a SUBPROCESS because conftest.py pins this process to the CPU
backend before jax is imported; the worker inherits a clean environment and
skips itself (exit 42) when no TPU is reachable.
"""
import os
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.tpu
def test_fused_backward_grad_parity_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(_HERE)
    proc = subprocess.run(
        [sys.executable, os.path.join(_HERE, "tpu_grad_parity_worker.py")],
        capture_output=True, text=True, timeout=1200, env=env)
    if proc.returncode == 42:
        pytest.skip("no TPU backend available")
    assert proc.returncode == 0, (
        f"TPU grad parity failed:\n{proc.stdout}\n{proc.stderr[-2000:]}")
    assert "TPU_GRAD_PARITY_OK" in proc.stdout
