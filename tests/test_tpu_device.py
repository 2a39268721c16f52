"""Opt-in on-silicon checks (pytest -m tpu, RR_TPU_TESTS=1).

The main suite forces the CPU backend (conftest.py), so these run
scripts/tpu_checks.py in a subprocess that keeps the session's real
accelerator platform. Skipped by default: the tunneled chip has a slow
cold handshake and is absent in CI-style environments."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not os.environ.get("RR_TPU_TESTS"),
                       reason="set RR_TPU_TESTS=1 to run on-silicon "
                              "checks"),
]


def test_device_checks_on_silicon():
    env = dict(os.environ)
    # keep the preset PYTHONPATH (axon plugin site) and add the repo
    pp = [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                   if p]
    # The tunneled-chip plugin registers via a sitecustomize on the
    # preset PYTHONPATH; re-add its dir in case the pytest invocation
    # replaced PYTHONPATH wholesale (CLAUDE.md).
    axon_site = os.path.expanduser("~/.axon_site")
    if os.path.isdir(axon_site) and axon_site not in pp:
        pp.append(axon_site)
    env["PYTHONPATH"] = os.pathsep.join(pp)
    # Keep the session's JAX_PLATFORMS (e.g. "axon"): unsetting it makes
    # jax probe every installed plugin, and the raw libtpu plugin fails
    # its host-metadata handshake in this tunneled environment, dropping
    # the subprocess to CPU.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_checks.py")],
        capture_output=True, text=True, timeout=900, env=env)
    sys.stdout.write(out.stdout)
    sys.stderr.write(out.stderr)
    assert out.returncode == 0
    assert "ALL PASS" in out.stdout
