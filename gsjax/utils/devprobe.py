"""TPU availability probe with wait-retry for the axon lingering-claim window.

On this environment one process holds the single TPU chip at a time; after a
TPU process exits its claim lingers 1-2 minutes, during which a new client
HANGS inside PJRT init (jax.devices() blocks; no timeout knob helps). Round 4
learned this the hard way: the driver's bench capture fired its one-shot 900 s
watchdog during exactly such a window and recorded 0.0 for the round.

`wait_for_device()` treats the window as expected weather: it runs a tiny
device op in a SUBPROCESS under a hard timeout (the hang is inside native PJRT
code, so only a separate process can be killed cleanly), and retries with a
pause until the claim releases or the attempt budget is exhausted. Callers
(bench.py, bench_reg.py) invoke it before importing jax in the process that
will do real work.

Env knobs (all optional):
  GSJAX_BENCH_PROBE_TIMEOUT  seconds per probe attempt (default 100)
  GSJAX_BENCH_PROBE_WAIT     pause between attempts (default 20)
  GSJAX_BENCH_PROBE_TRIES    max attempts (default 8)
  GSJAX_BENCH_PROBE_CMD      override probe argv via shlex (tests use this to
                             simulate a device-unavailable window)
"""

from __future__ import annotations

import os
import shlex
import signal
import subprocess
import sys
import time

_PROBE_SRC = """
import os, sys
import jax
if os.environ.get("GSJAX_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GSJAX_PLATFORM"])
x = jax.numpy.ones((8, 8))
# float() is the only reliable fence on the axon relay (block_until_ready
# resolves at enqueue) -- a 4-byte host fetch bounds the enqueued op.
assert float(x.sum()) == 64.0
sys.stdout.write("probe-ok\\n")
"""


def _probe_argv() -> list[str]:
    override = os.environ.get("GSJAX_BENCH_PROBE_CMD")
    if override:
        return shlex.split(override)
    return [sys.executable, "-c", _PROBE_SRC]


def _run_probe_once(timeout_s: float) -> bool:
    """One probe attempt in its own process group; SIGKILL the group on
    timeout (the PJRT hang does not die to SIGTERM)."""
    proc = subprocess.Popen(
        _probe_argv(),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    try:
        proc.wait(timeout=timeout_s)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait()
        return False


def wait_for_device(log=print) -> bool:
    """Block until the device answers a tiny op, retrying through lingering
    claims. Returns True when a probe succeeded, False if the budget ran out
    (callers then fall back to their own watchdog/error path)."""
    timeout_s = float(os.environ.get("GSJAX_BENCH_PROBE_TIMEOUT", 100))
    wait_s = float(os.environ.get("GSJAX_BENCH_PROBE_WAIT", 20))
    tries = int(os.environ.get("GSJAX_BENCH_PROBE_TRIES", 8))
    t0 = time.monotonic()
    for attempt in range(1, tries + 1):
        if _run_probe_once(timeout_s):
            log(f"device probe ok (attempt {attempt}, "
                f"{time.monotonic() - t0:.0f}s elapsed)")
            return True
        log(f"device probe attempt {attempt}/{tries} failed/hung "
            f"(lingering TPU claim?); waiting {wait_s:.0f}s")
        if attempt < tries:
            time.sleep(wait_s)
    log(f"device probe exhausted {tries} attempts "
        f"({time.monotonic() - t0:.0f}s)")
    return False
