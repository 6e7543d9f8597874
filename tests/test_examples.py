"""Smoke tier for the example drivers.

Each ``examples/*.py`` main runs for 2 steps on CPU at tiny shapes in a
subprocess, so a signature drift between an example and ``models/`` fails in
the fast tier rather than shipping silently (the rest of the suite covers the
models, not the argparse drivers). Mirrors the reference's CI scope, which
executes its examples (/root/reference/.github/workflows/run_tests.yml:36-37).
"""

import os
import subprocess
import sys

import pytest

# Integration tier: five subprocess cold-compiles (~4-5 CPU-min total)
# — run with `-m heavy` or `-m ""` (pyproject deselects by default).
pytestmark = pytest.mark.heavy

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

CASES = {
    "demo.py": ["--cpu"],
    "latent_sde.py": ["--steps", "2", "--batch", "8", "--cpu"],
    "latent_sde_lorenz.py": ["--steps", "2", "--batch", "8", "--t-size", "8",
                             "--latent", "3", "--context", "8",
                             "--hidden", "8", "--cpu"],
    "sde_gan.py": ["--steps", "2", "--batch", "8", "--t-size", "8",
                   "--dataset-size", "16", "--hidden", "4",
                   "--mlp-size", "4", "--swa-step-start", "1", "--cpu"],
    "cont_ddpm.py": ["--steps", "2", "--batch", "4", "--size", "8",
                     "--base-ch", "8", "--sample-dt", "0.25", "--cpu"],
}


@pytest.mark.parametrize("script", sorted(CASES))
def test_example_smoke(script):
    path = os.path.join(EXAMPLES, script)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, path] + CASES[script],
                         capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, (
        f"{script} failed:\nstdout: {out.stdout[-2000:]}\n"
        f"stderr: {out.stderr[-2000:]}")
    assert "nan" not in out.stdout.lower().replace("finite: true", ""), \
        f"{script} printed a NaN:\n{out.stdout[-2000:]}"
