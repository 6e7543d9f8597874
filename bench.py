"""Headline benchmark: latent-SDE training throughput (steps/sec/chip).

Matches the BASELINE.md flagship config (latent_sde_lorenz-style model with
logqp KL channel, adjoint gradients, batch 1024). The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` measures against the *reference
implementation itself* (google-research/torchsde) running the same model
shape/batch/solver on this host's CPU with torch — the only hardware both
implementations share here (torchsde has no TPU backend).

Robustness: the tunneled TPU backend executes asynchronously
(block_until_ready does not wait) and can wedge if a client dies mid-flight,
so the measurement runs in a subprocess with a timeout, chains data-dependent
steps, and forces one scalar fetch; if the TPU is unresponsive the benchmark
falls back to measuring our framework on the host CPU (clearly labeled).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

BATCH = 1024
DATA = 3
LATENT = 4
CTX = 64
HIDDEN = 128
T_SIZE = 32
T1 = 1.0
DT = 1.0 / 128
N_STEPS = 48
TPU_TIMEOUT_S = 1080  # two compiles per attempt now (primary + XLA anchor)


def bench_ours(platform=None, adjoint=False):
    """Measure our framework's training steps/sec. Called in a subprocess.

    ``adjoint=False`` (backprop-through-solver) is the headline mode: it
    matches the reference flagship example's default
    (/root/reference/examples/latent_sde_lorenz.py:287) and is the faster
    gradient mode at this scale (BENCH_NOTES §1)."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
    from torchsde_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()  # repeat cold-starts skip XLA (BENCH_NOTES §5)

    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, T1, T_SIZE)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T_SIZE, BATCH, DATA))
    model = LatentSDE(jax.random.fold_in(key, 2), DATA, LATENT, CTX, HIDDEN)

    # On TPU the solve runs as ONE whole-solve Pallas kernel (fwd) + one
    # (hand-derived bwd) — ops/latent_fused.py; +23% over the XLA scan at
    # this config (BENCH_NOTES §1b). The CPU fallback keeps the XLA path
    # (the kernel would need the slow Pallas interpreter there).
    fused = not adjoint and jax.devices()[0].platform != "cpu"
    if fused:
        try:  # probe BOTH kernels (fwd + hand-derived bwd) once; fall back
            ksmall = jax.random.PRNGKey(0)
            small = LatentSDE(ksmall, DATA, LATENT, CTX, HIDDEN)
            xs_s = jnp.zeros((4, 8, DATA))
            g = jax.grad(lambda m: latent_sde_loss(
                m, xs_s, jnp.linspace(0.0, 1.0, 4), ksmall, dt=0.25,
                fused=True)[0])(small)
            float(jnp.sum(g.f_net.layers[0].w))
        except Exception as e:  # pragma: no cover
            print(f"# fused kernel probe failed ({type(e).__name__}); "
                  "using XLA path", file=sys.stderr)
            fused = False

    def measure(use_fused):
        def loss_fn(model, xs, key):
            loss, _ = latent_sde_loss(model, xs, ts, key, dt=DT,
                                      adjoint=adjoint, fused=use_fused)
            return loss

        def train_step(model, step_idx):
            # fold_in INSIDE the jit: an eager fold_in would dispatch its own
            # tiny device program every iteration (tunnel RTT each, ~0.4 ms).
            loss, grads = jax.value_and_grad(loss_fn)(
                model, xs, jax.random.fold_in(key, step_idx))
            model = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, model,
                                           grads)
            return model, loss

        # Packed training state: the model crosses the host/device boundary
        # as ONE flat buffer per iteration instead of ~35 leaf handles (~25 us
        # of host/tunnel overhead per leaf per step) — utils/packing.py. With
        # the fused kernels the device step is ~7 ms, so per-dispatch tunnel
        # overhead matters: run K=4 full train steps per dispatch inside
        # lax.scan (within-run A/B: +7% over 1-step dispatches).
        from torchsde_tpu.utils.packing import pack_train_step
        step = pack_train_step(train_step, model)
        K = 4
        mstep = step.multi(K)
        n_timed = (N_STEPS // K) * K
        packed = step.pack(model)
        _, losses = mstep(packed, jnp.int32(0))  # compile + warmup
        float(losses[-1])  # forces real execution (async backend)
        t0 = time.perf_counter()
        p = packed
        for i in range(n_timed // K):
            p, losses = mstep(p, jnp.int32(i))
        float(losses[-1])  # one fetch at the end of the dependent chain
        return n_timed / (time.perf_counter() - t0)

    primary = measure(fused)
    # Within-run A/B anchor (VERDICT r2 item 4): the XLA path measured in the
    # SAME session. The tunnel's dispatch floor wanders 0.39-2.0 ms between
    # sessions (BENCH_NOTES §5), so the fused/XLA ratio — both paying the
    # same floor — distinguishes code regressions from tunnel drift where a
    # bare absolute number cannot.
    anchor = measure(False) if fused else None
    return primary, jax.devices()[0].platform, anchor


def bench_ours_subprocess():
    """Run bench_ours on the default (TPU) backend in a subprocess so a wedged
    device tunnel cannot hang the whole benchmark; fall back to host CPU.

    The tunnel's wedges are transient (BENCH_NOTES "Environment caveat"), so
    the TPU gets TWO attempts with a cool-down before the CPU fallback — a
    single unlucky wedge should not turn the round's headline into a CPU
    number."""
    attempts = ((None, TPU_TIMEOUT_S), (None, TPU_TIMEOUT_S), ("cpu", 900))
    for i, (platform, timeout) in enumerate(attempts):
        if i == 1:
            time.sleep(60)  # cool-down: wedges clear on their own
        cmd = [sys.executable, os.path.abspath(__file__), "--ours-only"]
        if platform:
            cmd.append("--cpu")
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout, cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in out.stdout.splitlines():
                if line.startswith("OURS"):
                    _, val, plat, anchor = line.split()
                    return (float(val), plat,
                            None if anchor == "None" else float(anchor))
            print(f"# ours ({platform or 'tpu'}) produced no result: "
                  f"{out.stdout[-200:]} {out.stderr[-500:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# ours ({platform or 'tpu'}) timed out after {timeout}s",
                  file=sys.stderr)
    return None, None, None


def host_load_check(max_load_frac=0.25, wait_s=30, attempts=4):
    """Pinned idle-host precondition for CPU-denominator measurements.

    Returns (load1, ok): the 1-minute loadavg and whether it is below
    ``max_load_frac * cpu_count``. If the host is busy, waits ``wait_s`` and
    retries up to ``attempts`` times, then proceeds with ok=False (the
    measurement still runs — best-of-N below absorbs transient contention —
    but the recorded flag marks the denominator as measured on a loaded
    host). This is the protocol fix for the round-2/3 vs_baseline swings
    (VERDICT r3 weak #3): the denominator moved 24x with host contention."""
    ncpu = os.cpu_count() or 1
    for i in range(attempts):
        load1 = os.getloadavg()[0]
        if load1 <= max_load_frac * ncpu:
            return load1, True
        print(f"# host busy (load {load1:.1f} > {max_load_frac:.2f}*{ncpu}); "
              f"waiting {wait_s}s ({i + 1}/{attempts})", file=sys.stderr)
        time.sleep(wait_s)
    return os.getloadavg()[0], False


def bench_reference_cpu(n_steps=3, n_reps=5):
    """The reference torchsde (from /root/reference) on torch-CPU, same model
    shape and solver config.

    PINNED PROTOCOL (BENCH_NOTES §1a-bis): (1) idle-host check — 1-min
    loadavg must be <= 0.25*cpu_count, else wait-and-retry then proceed with
    a recorded busy flag; (2) one warmup step; (3) ``n_reps`` independent
    repetitions of a ``n_steps``-step timed block; (4) aggregation =
    **best rep** (max steps/sec): contention can only slow a rep down, so
    the fastest rep is the least-contended estimate of the machine's true
    throughput. Returns (steps_per_sec, protocol_record) or (None, None)."""
    try:
        # Import the shim before /root/reference shadows our benchmarks pkg.
        import benchmarks._trampoline_shim  # registers 'trampoline'  # noqa: F401
        sys.path.insert(0, "/root/reference")
        import torch
        import torch.nn as nn
        import torchsde

        torch.manual_seed(0)

        class RefLatentSDE(torchsde.SDEIto):
            def __init__(self):
                super().__init__(noise_type="diagonal")
                self.f_net = nn.Sequential(nn.Linear(LATENT + CTX, HIDDEN),
                                           nn.Softplus(),
                                           nn.Linear(HIDDEN, HIDDEN),
                                           nn.Softplus(),
                                           nn.Linear(HIDDEN, LATENT))
                self.h_net = nn.Sequential(nn.Linear(LATENT, HIDDEN),
                                           nn.Softplus(),
                                           nn.Linear(HIDDEN, HIDDEN),
                                           nn.Softplus(),
                                           nn.Linear(HIDDEN, LATENT))
                self.g_nets = nn.ModuleList(
                    nn.Sequential(nn.Linear(1, HIDDEN), nn.Softplus(),
                                  nn.Linear(HIDDEN, 1), nn.Sigmoid())
                    for _ in range(LATENT))
                self.encoder = nn.GRU(DATA, HIDDEN)
                self.enc_proj = nn.Linear(HIDDEN, CTX)
                self.qz0_net = nn.Linear(CTX, 2 * LATENT)
                self.projector = nn.Linear(LATENT, DATA)
                self._ctx = None

            def contextualize(self, ctx):
                self._ctx = ctx

            def f(self, t, y):
                ts_, ctx = self._ctx
                i = min(int((t / T1) * (len(ts_) - 1)), len(ts_) - 1)
                return self.f_net(torch.cat((y, ctx[i]), dim=1))

            def h(self, t, y):
                return self.h_net(y)

            def g(self, t, y):
                y = torch.split(y, split_size_or_sections=1, dim=1)
                out = [g_net_i(y_i) for (g_net_i, y_i) in zip(self.g_nets, y)]
                return torch.cat(out, dim=1)

        sde = RefLatentSDE()
        opt = torch.optim.SGD(sde.parameters(), lr=1e-4)
        ts = torch.linspace(0.0, T1, T_SIZE)
        xs = torch.randn(T_SIZE, BATCH, DATA)

        def step():
            opt.zero_grad()
            hs, _ = sde.encoder(torch.flip(xs, dims=(0,)))
            ctx = sde.enc_proj(torch.flip(hs, dims=(0,)))
            sde.contextualize((ts, ctx))
            qz0_mean, qz0_logstd = sde.qz0_net(ctx[0]).chunk(chunks=2, dim=1)
            z0 = qz0_mean + qz0_logstd.exp() * torch.randn_like(qz0_mean)
            # Backprop-through-solver (sdeint), matching the reference
            # flagship example's default mode (latent_sde_lorenz.py:287) and
            # the mode measured for our framework.
            zs, log_ratio = torchsde.sdeint(
                sde, z0, ts, dt=DT, logqp=True, method="euler")
            _xs = sde.projector(zs)
            loss = ((_xs - xs) ** 2).mean() + log_ratio.sum(0).mean()
            loss.backward()
            opt.step()

        load1, idle = host_load_check()
        step()  # warmup
        reps = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            for _ in range(n_steps):
                step()
            reps.append(n_steps / (time.perf_counter() - t0))
        best = max(reps)
        protocol = {
            "host_load1": round(load1, 2), "host_idle": idle,
            "cpu_count": os.cpu_count(), "n_reps": n_reps,
            "steps_per_rep": n_steps, "aggregation": "best_rep",
            "rep_steps_per_sec": [round(r, 4) for r in reps],
        }
        return best, protocol
    except Exception as e:
        print(f"# reference baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None, None


def main():
    if "--ours-only" in sys.argv:
        platform = "cpu" if "--cpu" in sys.argv else None
        v, plat, anchor = bench_ours(platform)
        print(f"OURS {v} {plat} {anchor}")
        return

    ours, platform, anchor = bench_ours_subprocess()
    ref, ref_protocol = bench_reference_cpu()
    vs = (ours / ref) if (ours and ref) else None
    result = {
        "metric": f"latent-SDE logqp train steps/sec, backprop-through-solver "
                  f"(reference-default mode, batch {BATCH}, "
                  f"{platform or 'unavailable'} chip) vs torchsde-reference on host CPU",
        "value": round(ours, 3) if ours else 0.0,
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    if anchor:
        # Within-run A/B: same session, same dispatch floor. fused_vs_xla is
        # the drift-immune signal (~1.2 when healthy, BENCH_NOTES §1b); a
        # headline drop WITHOUT a ratio drop is tunnel drift, not regression.
        result["anchor"] = {"xla_path_steps_per_sec": round(anchor, 3),
                            "fused_vs_xla": round(ours / anchor, 3)}
    if ref_protocol:
        result["baseline_protocol"] = dict(
            ref_protocol, ref_steps_per_sec=round(ref, 4))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
