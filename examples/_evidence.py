"""Shared training-evidence helpers for the example drivers.

The reference's examples are proven-to-train artifacts: latent_sde saves fit
plots and checkpoints every ``pause_every`` steps
(/root/reference/examples/latent_sde.py:283-339), sde_gan evaluates
generated-vs-real marginals during training
(/root/reference/examples/sde_gan.py:443-506), cont_ddpm samples images on a
schedule (/root/reference/examples/cont_ddpm.py:276-306). These helpers give
every driver the same ``--log-jsonl`` / ``--artifacts-dir`` machinery so a
training run leaves a committed loss trajectory + qualitative artifact +
numeric acceptance (VERDICT r2 item 1) instead of stdout that scrolls away.
"""

import json
import os


class JsonlLogger:
    """Append-per-record JSONL logger (no-op when path is None)."""

    def __init__(self, path):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            # Truncate: each run owns its trajectory file.
            with open(path, "w"):
                pass

    def write(self, **record):
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def artifact_path(artifacts_dir, name):
    os.makedirs(artifacts_dir, exist_ok=True)
    return os.path.join(artifacts_dir, name)


def save_acceptance(artifacts_dir, name, **record):
    """Write the numeric acceptance record and echo it to stdout."""
    line = json.dumps(record)
    print("ACCEPTANCE " + line)
    if artifacts_dir:
        with open(artifact_path(artifacts_dir, name), "w") as f:
            f.write(line + "\n")
    return record
