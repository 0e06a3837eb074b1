"""bench.py must survive a device-unavailable window (VERDICT r4 item 1).

Round 4's driver-captured BENCH_r04.json recorded 0.0 because the axon TPU
claim from an earlier process lingered through bench.py's one-shot watchdog.
The fix is a probe-retry loop (gsjax/utils/devprobe.py) run by the bench
supervisor before the child binds the device. These tests simulate the
lingering-claim window with a fake probe command that HANGS (like the real
PJRT init does) for the first attempts and only succeeds later, then assert
the bench still emits a real JSON result line.
"""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A probe that hangs until a marker file records >= UNBLOCK_AT prior attempts.
# Each invocation appends one byte to the marker; while blocked it sleeps past
# the per-attempt timeout (simulating the PJRT hang, which never returns).
_FAKE_PROBE = """\
import os, sys, time
marker = os.environ["FAKE_PROBE_MARKER"]
unblock_at = int(os.environ.get("FAKE_PROBE_UNBLOCK_AT", 3))
with open(marker, "ab") as f:
    f.write(b".")
attempts = os.path.getsize(marker)
if attempts < unblock_at:
    time.sleep(3600)   # hang: the supervisor must SIGKILL us
sys.exit(0)
"""


def _env_for(tmp_path, unblock_at: int) -> tuple[dict, str]:
    script = tmp_path / "fake_probe.py"
    script.write_text(_FAKE_PROBE)
    marker = str(tmp_path / "probe_attempts")
    env = dict(os.environ)
    env.update({
        # fake probe: hangs (needs kill) until the `unblock_at`-th attempt
        "GSJAX_BENCH_PROBE_CMD": f"{sys.executable} {script}",
        "FAKE_PROBE_MARKER": marker,
        "FAKE_PROBE_UNBLOCK_AT": str(unblock_at),
        "GSJAX_BENCH_PROBE_TIMEOUT": "20",
        "GSJAX_BENCH_PROBE_WAIT": "10",
        "GSJAX_BENCH_PROBE_TRIES": "5",
        # tiny CPU bench so the post-probe run is fast
        "GSJAX_PLATFORM": "cpu",
        "GSJAX_BENCH_WIDTH": "128",
        "GSJAX_BENCH_HEIGHT": "96",
        "GSJAX_BENCH_N": "500",
        "GSJAX_BENCH_ITERS": "1",
        "GSJAX_BENCH_TIMEOUT": "600",
    })
    # conftest disables the compile cache for in-process tests; the bench
    # subprocess manages its own.
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return env, marker


def test_wait_for_device_retries_through_hang(tmp_path):
    """wait_for_device alone: 2 hanging attempts (killed at 20 s each), then
    success — ~60 s of simulated unavailability."""
    from gsjax.utils import devprobe

    env, marker = _env_for(tmp_path, unblock_at=3)
    env_backup = dict(os.environ)
    os.environ.update(env)
    try:
        t0 = time.monotonic()
        ok = devprobe.wait_for_device(log=lambda m: None)
        dt = time.monotonic() - t0
    finally:
        os.environ.clear()
        os.environ.update(env_backup)
    assert ok, "probe should eventually succeed"
    assert os.path.getsize(marker) == 3
    # two 20s hangs + two 10s waits ≈ 60 s of unavailable window survived
    assert dt >= 55


def test_wait_for_device_budget_exhaustion(tmp_path):
    """When the window never ends, the budget runs out and returns False
    (bench then reports an error JSON instead of hanging forever)."""
    from gsjax.utils import devprobe

    env, marker = _env_for(tmp_path, unblock_at=99)
    # timeout must cover interpreter startup on this 1-core host
    env.update({"GSJAX_BENCH_PROBE_TIMEOUT": "8",
                "GSJAX_BENCH_PROBE_WAIT": "1",
                "GSJAX_BENCH_PROBE_TRIES": "3"})
    env_backup = dict(os.environ)
    os.environ.update(env)
    try:
        ok = devprobe.wait_for_device(log=lambda m: None)
    finally:
        os.environ.clear()
        os.environ.update(env_backup)
    assert not ok
    assert os.path.getsize(marker) == 3


@pytest.mark.slow
def test_bench_survives_unavailable_window(tmp_path):
    """End-to-end: bench.py (supervisor mode) through a ~60 s synthetic
    device-unavailable window still prints a real JSON line with value > 0."""
    env, marker = _env_for(tmp_path, unblock_at=3)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "raster_fwd_bwd_rays_per_s_1080p"
    assert out["value"] > 0, out
    assert "error" not in out
    assert os.path.getsize(marker) == 3   # survived exactly the fake window
