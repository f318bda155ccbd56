"""Backend-availability diagnostic path (VERDICT round 4, item 1).

The round-4 axon relay outage made ``jax.devices()`` hang >25 min and
``bench.py`` die with a raw traceback indistinguishable from a repo
regression. ``probe_backend`` bounds the init and ``bench.py`` emits one
machine-readable ``{"error": "tpu_backend_unavailable", ...}`` line. These
tests force the failure and check both layers.
"""
import json
import os
import subprocess
import sys
import time

import pytest

from splatfields_tpu.utils.system import probe_backend

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestProbeBackend:
    def test_success(self):
        devs, err = probe_backend(timeout_s=5.0, probe=lambda: ["dev0"])
        assert devs == ["dev0"] and err is None

    def test_timeout_path(self):
        t0 = time.perf_counter()
        devs, err = probe_backend(
            timeout_s=0.2, retries=1, probe=lambda: time.sleep(30))
        assert devs is None
        assert "did not return" in err
        # bounded: 2 attempts x 0.2s, not 30s
        assert time.perf_counter() - t0 < 5.0

    def test_error_path(self):
        def boom():
            raise RuntimeError("Unable to initialize backend 'axon'")
        devs, err = probe_backend(timeout_s=5.0, retries=1, probe=boom)
        assert devs is None
        assert "Unable to initialize backend" in err

    def test_retry_then_success(self):
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) == 1:
                raise RuntimeError("transient")
            return ["dev0"]

        devs, err = probe_backend(timeout_s=5.0, retries=1, probe=flaky)
        assert devs == ["dev0"] and err is None and len(calls) == 2

    def test_forced_failure_env(self, monkeypatch):
        monkeypatch.setenv("SPLATFIELDS_FORCE_BACKEND_FAIL", "1")
        devs, err = probe_backend(timeout_s=5.0, probe=lambda: ["dev0"])
        assert devs is None and "forced" in err


@pytest.mark.slow
def test_bench_emits_machine_readable_outage():
    """Forced outage: bench.py must exit 1 with ONE parseable JSON line."""
    env = dict(os.environ, SPLATFIELDS_FORCE_BACKEND_FAIL="1")
    env.pop("PYTHONPATH", None)  # run exactly as the driver does: from cwd
    proc = subprocess.run(
        [sys.executable, "bench.py", "--iters", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 1, (proc.stdout, proc.stderr)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["error"] == "tpu_backend_unavailable"
    assert rec["environmental"] is True
    assert rec["value"] is None
