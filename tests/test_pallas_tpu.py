"""On-real-TPU parity test for the Pallas kernels.

The rest of the suite runs on the virtual CPU mesh (conftest pins
JAX_PLATFORMS=cpu), where the Pallas kernels execute in interpret mode —
which cannot detect a real-device DMA-vs-vector race in the double-buffered
gather (`_gather_kernel`). This test spawns a FRESH process without the CPU
pin and runs tools/check_pallas_tpu.py on whatever accelerator is attached;
it self-skips (exit code 2) when none is.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.slow
def test_pallas_kernels_on_device():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # Drop the forced host-device-count flag the conftest added.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_pallas_tpu.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode == 2:
        pytest.skip(f"no TPU attached: {proc.stdout.strip()}")
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-2000:]}"
