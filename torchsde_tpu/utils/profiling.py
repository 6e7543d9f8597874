"""Profiling hooks (SURVEY.md §5.1).

The reference has no tracer — it times with ``time.perf_counter`` in its
benchmark scripts (/root/reference/benchmarks/brownian.py:34-41) and counts
function evaluations on its test problems
(/root/reference/tests/problems.py:44,55-72). The TPU-native equivalents:

* solve-level counters (``nfe``/``n_accepted``/``n_rejected``) are threaded
  through the solver carry on device and exposed via
  ``sdeint(..., return_stats=True)``;
* hardware-level tracing uses ``jax.profiler`` — wrap any region in
  :func:`trace` and open the dump with TensorBoard or Perfetto::

      from torchsde_tpu.utils.profiling import trace, annotate

      with trace("/tmp/sde_profile"):
          with annotate("train_step"):
              loss = train_step(model, xs, key)
          jax.block_until_ready(loss)
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """Capture a ``jax.profiler`` trace of the enclosed region into
    ``logdir`` (viewable in TensorBoard's profile tab / Perfetto)."""
    with jax.profiler.trace(str(logdir), create_perfetto_link=create_perfetto_link):
        yield


def annotate(name):
    """Named sub-region inside a :func:`trace` capture; shows up as a span on
    the host timeline."""
    return jax.profiler.TraceAnnotation(name)


class WallTimer:
    """Tiny wall-clock timer for benchmark scripts. Measures *host* wall time
    only: the tunneled TPU backend executes asynchronously (and
    ``block_until_ready`` alone does not guarantee completion), so the clock
    stops at dispatch unless the caller forces a device fetch — call
    ``WallTimer.fetch(result)`` inside the timed block to time real
    execution."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False

    @staticmethod
    def fetch(x):
        return float(jax.numpy.asarray(x).reshape(-1)[0])
