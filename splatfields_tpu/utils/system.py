"""Filesystem helpers (reference ``utils/system_utils.py``)."""
from __future__ import annotations

import os


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def enable_persistent_compile_cache(cache_dir: str | None = None):
    """Point JAX at an on-disk compilation cache.

    The axon remote-compile relay makes cold compiles of the big train step
    take many minutes; the persistent cache stores the compiled executable so
    a fresh process skips the relay entirely (verified: works with the axon
    backend).  Call BEFORE the first jit execution.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


class StallWatchdog:
    """Detect a wedged training process and exit deterministically.

    The axon relay can transiently HANG a device call for 20-30+ minutes
    (observed twice round 5: a render CLI dispatch and a mid-training
    recompile at longrun iter 19.2k — CPU time frozen, no exception ever
    raised). A blocked-in-C jax call cannot be interrupted from Python, so
    recovery means: exit the process with a distinctive code and let a
    supervisor restart with ``--resume`` (checkpoints make that lossless
    up to the last save). ``beat()`` is called once per host-loop
    iteration; a daemon thread exits the process via ``exit_fn`` if no
    beat arrives within ``timeout_min`` minutes. Compiles of the big
    scanned step can legitimately take ~15 min through the relay — set
    the timeout ABOVE worst-case compile (default 30 min).

    ``clock``/``exit_fn`` are injectable for tests.
    """

    EXIT_CODE = 114  # distinctive: supervisors restart with --resume

    def __init__(self, timeout_min: float, clock=None, exit_fn=None,
                 poll_s: float = 10.0):
        import threading
        import time as _time
        self._clock = clock or _time.monotonic
        self._exit = exit_fn or (lambda: os._exit(self.EXIT_CODE))
        self._timeout_s = timeout_min * 60.0
        self._poll_s = poll_s
        self._last = self._clock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def beat(self):
        self._last = self._clock()

    def stop(self):
        self._stop.set()

    def _run(self):
        import json
        import sys
        while not self._stop.wait(self._poll_s):
            idle = self._clock() - self._last
            if idle > self._timeout_s:
                print(json.dumps({
                    "error": "training_stalled",
                    "environmental": True,
                    "idle_s": round(idle, 1),
                    "detail": "no training-loop progress; likely a hung "
                              "relay call (device dispatch or remote "
                              "compile). Restart with --resume.",
                }), flush=True)
                sys.stdout.flush()
                self._exit()
                return


def probe_backend(timeout_s: float = 240.0, retries: int = 0, probe=None):
    """Bounded-timeout backend initialization probe.

    The axon TPU relay can be down at the environment level, in which case
    ``jax.devices()`` either raises ("Unable to initialize backend 'axon'")
    or HANGS indefinitely (observed round 4, BENCH_r04.json / VERDICT.md).
    This runs the probe in a daemon thread with a deadline so callers can
    emit a machine-readable diagnostic instead of hanging.

    ``retries`` defaults to 0: on the HANG path a retry cannot succeed —
    the first probe thread is stuck INSIDE xla_bridge backend init holding
    its init lock, so a second ``jax.devices()`` just blocks on that lock
    and times out identically, doubling outage-diagnosis latency for
    nothing (round-5 review finding). Raise-path errors also don't
    self-heal within seconds here.

    Returns ``(devices, None)`` on success or ``(None, reason)`` after
    ``retries`` extra attempts. ``SPLATFIELDS_FORCE_BACKEND_FAIL=1`` forces
    the failure path (for testing the diagnostic).

    NOTE: a hung probe thread cannot be killed; callers that got
    ``(None, ...)`` should exit via ``os._exit`` after printing.
    """
    import threading

    if os.environ.get("SPLATFIELDS_FORCE_BACKEND_FAIL") == "1":
        return None, "forced by SPLATFIELDS_FORCE_BACKEND_FAIL=1"
    if probe is None:
        def probe():
            import jax
            return jax.devices()
    last_err = None
    for _attempt in range(retries + 1):
        result = {}

        def run():
            try:
                result["devices"] = probe()
            except Exception as e:  # noqa: BLE001 — diagnostic path
                result["error"] = repr(e)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout_s)
        if th.is_alive():
            last_err = (f"backend init did not return within "
                        f"{timeout_s:.0f}s (relay hang)")
            continue
        if "devices" in result:
            return result["devices"], None
        last_err = result.get("error", "unknown backend init failure")
    return None, last_err


def search_for_max_iteration(folder: str):
    """Max iteration_N subdirectory (reference :28-30)."""
    if not os.path.isdir(folder):
        return None
    saved = [int(f.split("_")[-1]) for f in os.listdir(folder)
             if f.startswith("iteration_")]
    return max(saved) if saved else None
