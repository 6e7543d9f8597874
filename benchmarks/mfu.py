"""Flagship-model throughput + MFU accounting (VERDICT r1 item 4).

Measures the latent-SDE logqp adjoint training step (bench.py flagship config)
across batch sizes and dtypes, and reports:

* steps/sec (data-dependent chain, single host fetch — the tunneled TPU
  backend executes asynchronously);
* FLOPs/step from XLA's own compiled cost analysis (falls back to an analytic
  matmul count if the backend doesn't expose cost_analysis);
* MFU = FLOPs/step x steps/sec / chip peak (peak per device kind, bf16
  convention).

Usage: python benchmarks/mfu.py [--cpu] [--quick]. Results recorded in
BENCH_NOTES.md and cited next to BENCH_r* numbers.
"""

import argparse
import json
import time

DATA, LATENT, CTX, HIDDEN, T_SIZE, T1, DT = 3, 4, 64, 128, 32, 1.0, 1.0 / 128

# bf16 peak FLOP/s per chip (f32 runs on the same MXU at a lower rate; MFU is
# reported against the bf16 peak by convention, so f32 MFU understates
# hardware utilisation by the f32/bf16 rate ratio).
_PEAKS = {
    "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v6e": 918e12, "v6 lite": 918e12,
    "cpu": 1e12,  # nominal, so the script still prints something off-TPU
}


def peak_for(device):
    kind = getattr(device, "device_kind", "cpu").lower()
    for k, v in _PEAKS.items():
        if k in kind:
            return v, kind
    import os
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    for k, v in _PEAKS.items():
        if k in gen:
            return v, f"{kind} (env {gen})"
    return 197e12, f"{kind} (assumed v5e)"


def analytic_flops_per_step(batch):
    """Hand count of matmul FLOPs for one fwd+bwd train step (2 MACs = 2
    FLOPs per weight per example; backward ~ 2x forward)."""
    n_solver_steps = int(round(T1 / DT))
    f_net = 2 * ((LATENT + CTX) * HIDDEN + HIDDEN * HIDDEN + HIDDEN * LATENT)
    h_net = 2 * (LATENT * HIDDEN + HIDDEN * HIDDEN + HIDDEN * LATENT)
    g_nets = 2 * LATENT * (1 * HIDDEN + HIDDEN * 1)
    per_step = f_net + h_net + g_nets  # one euler step: one f_aug + g eval
    gru = 2 * 3 * (DATA * HIDDEN + HIDDEN * HIDDEN) * T_SIZE
    proj = 2 * (HIDDEN * CTX * T_SIZE + CTX * 2 * LATENT + LATENT * DATA * T_SIZE)
    fwd = batch * (n_solver_steps * per_step + gru + proj)
    return 3 * fwd  # fwd + ~2x fwd for the adjoint/backward pass


def measure(batch, dtype_name, n_steps=16, platform=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss

    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[dtype_name]
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, T1, T_SIZE)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T_SIZE, batch, DATA),
                           dtype)
    model = LatentSDE(jax.random.fold_in(key, 2), DATA, LATENT, CTX, HIDDEN,
                      dtype=dtype)

    def loss_fn(model, xs, key):
        loss, _ = latent_sde_loss(model, xs, ts, key, dt=DT)
        return loss

    @jax.jit
    def train_step(model, xs, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, xs, key)
        model = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, model, grads)
        return model, loss

    lowered = train_step.lower(model, xs, key)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    flops_src = "xla-cost-analysis"
    if not flops:
        flops = float(analytic_flops_per_step(batch))
        flops_src = "analytic"

    m, loss = train_step(model, xs, key)
    float(loss)
    t0 = time.perf_counter()
    mm = model
    for i in range(n_steps):
        mm, loss = train_step(mm, xs, jax.random.fold_in(key, i))
    float(loss)
    sps = n_steps / (time.perf_counter() - t0)

    dev = jax.devices()[0]
    peak, kind = peak_for(dev)
    return dict(batch=batch, dtype=dtype_name, steps_per_sec=round(sps, 2),
                flops_per_step=flops, flops_src=flops_src,
                samples_per_sec=round(sps * batch, 1),
                mfu_pct=round(100.0 * flops * sps / peak, 3),
                device=kind, peak_tflops=peak / 1e12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    configs = [(1024, "float32"), (4096, "float32"), (16384, "float32"),
               (1024, "bfloat16"), (16384, "bfloat16")]
    if args.quick:
        configs = [(256, "float32")]
    rows = []
    for batch, dt in configs:
        r = measure(batch, dt, platform="cpu" if args.cpu else None)
        rows.append(r)
        print(json.dumps(r))
    print()
    print("| batch | dtype | steps/s | samples/s | GFLOPs/step | MFU % |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['dtype']} | {r['steps_per_sec']} | "
              f"{r['samples_per_sec']} | {r['flops_per_step']/1e9:.2f} "
              f"({r['flops_src']}) | {r['mfu_pct']} |")


if __name__ == "__main__":
    main()
