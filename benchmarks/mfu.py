"""Throughput + MFU accounting for all three flagship workloads.

VERDICT r1 item 4 measured MFU for the latency-bound latent-SDE flagship
only; VERDICT r2 item 2 extends it to the compute-bound workloads — the
cont-DDPM U-Net (convs + attention, real MXU work) and the SDE-GAN pair —
where an MFU denominator can expose a findable 10x that bare steps/s hides.

For each (workload, batch, dtype) this measures:

* steps/sec (data-dependent chain, single host fetch — the tunneled TPU
  backend executes asynchronously);
* FLOPs/step from XLA's own compiled cost analysis of the full train step
  (fwd + bwd + update). For the latent workload an analytic matmul count is
  kept as a cross-check/fallback;
* MFU = FLOPs/step x steps/sec / chip peak (peak per device kind, bf16
  convention — f32 runs are reported against the same bf16 peak, so f32 MFU
  understates hardware utilisation by the f32/bf16 rate ratio).

Usage: python benchmarks/mfu.py [--cpu] [--quick] [--workload latent|ddpm|gan]
Results recorded in BENCH_NOTES.md and cited next to BENCH_r* numbers.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA, LATENT, CTX, HIDDEN, T_SIZE, T1, DT = 3, 4, 64, 128, 32, 1.0, 1.0 / 128

# bf16 peak FLOP/s per chip.
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
    """Hand count of matmul FLOPs for one latent-SDE fwd+bwd train step
    (2 MACs = 2 FLOPs per weight per example; backward ~ 2x forward)."""
    n_solver_steps = int(round(T1 / DT))
    f_net = 2 * ((LATENT + CTX) * HIDDEN + HIDDEN * HIDDEN + HIDDEN * LATENT)
    h_net = 2 * (LATENT * HIDDEN + HIDDEN * HIDDEN + HIDDEN * LATENT)
    g_nets = 2 * LATENT * (1 * HIDDEN + HIDDEN * 1)
    per_step = f_net + h_net + g_nets  # one euler step: one f_aug + g eval
    gru = 2 * 3 * (DATA * HIDDEN + HIDDEN * HIDDEN) * T_SIZE
    proj = 2 * (HIDDEN * CTX * T_SIZE + CTX * 2 * LATENT + LATENT * DATA * T_SIZE)
    fwd = batch * (n_solver_steps * per_step + gru + proj)
    return 3 * fwd  # fwd + ~2x fwd for the adjoint/backward pass


# --------------------------------------------------------------------------- #
#  Workload builders: each returns (train_step, state0, key) with the uniform
#  contract  state, loss = train_step(state, key)  so measurement is shared.
# --------------------------------------------------------------------------- #


def build_latent(batch, dtype):
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss

    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, T1, T_SIZE)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T_SIZE, batch, DATA),
                           dtype)
    model = LatentSDE(jax.random.fold_in(key, 2), DATA, LATENT, CTX, HIDDEN,
                      dtype=dtype)

    def train_step(model, key):
        def lf(m):
            loss, _ = latent_sde_loss(m, xs, ts, key, dt=DT)
            return loss
        loss, grads = jax.value_and_grad(lf)(model)
        model = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, model, grads)
        return model, loss

    return train_step, model, key


def build_ddpm(batch, dtype, size=16, base_ch=32, ch_mults=(1, 2)):
    """cont-DDPM score-matching train step (examples/cont_ddpm.py config:
    16x16 blobs, base_ch 32, ch_mults (1, 2)) — conv/attention U-Net, the
    compute-bound workload (73.9 steps/s at b512 was diagnosed compute-bound
    in BENCH_NOTES §1c with no FLOPs denominator until now)."""
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.models.cont_ddpm import ScoreMatchingSDE
    from torchsde_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.fold_in(key, 1),
                           (batch, 1, size, size), dtype) * 2 - 1
    denoiser = UNet(jax.random.fold_in(key, 2), in_ch=1, base_ch=base_ch,
                    ch_mults=ch_mults, dtype=dtype)
    sde = ScoreMatchingSDE(denoiser, input_size=(1, size, size))

    def train_step(sde, key):
        def lf(s):
            return jnp.mean(s.loss(key, x, partitions=1))
        loss, grads = jax.value_and_grad(lf)(sde)
        sde = jax.tree_util.tree_map(lambda p, g: p - 2e-4 * g, sde, grads)
        return sde, loss

    return train_step, sde, key


def build_gan(batch, dtype, t_size=32):
    """SDE-GAN generator+discriminator step at the reference scale
    (hidden 16, mlp 16, 1 layer — examples/sde_gan.py defaults)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchsde_tpu.models import sde_gan as G

    key = jax.random.PRNGKey(0)
    ts_dev, data = G.get_ou_data(jax.random.fold_in(key, 0),
                                 max(batch, 256), t_size)
    ts = np.asarray(ts_dev)
    real = jnp.asarray(data[:batch], dtype)
    gen = G.Generator(jax.random.fold_in(key, 1), data_size=1,
                      initial_noise_size=5, noise_size=3, hidden_size=16,
                      mlp_size=16, num_layers=1, dtype=dtype)
    disc = G.Discriminator(jax.random.fold_in(key, 2), data_size=1,
                           hidden_size=17, mlp_size=16, num_layers=1,
                           dtype=dtype)

    def train_step(state, key):
        gen, disc = state
        loss, g_gen, g_disc = G.gan_grads(gen, disc, key, ts, real,
                                          adjoint=False)
        gen = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, gen, g_gen)
        disc = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, disc, g_disc)
        return (gen, disc), loss

    return train_step, (gen, disc), key


def build_ddpm28(batch, dtype):
    """The BENCH_NOTES §1c headline DDPM config: 28x28 MNIST-scale images,
    base 32, ch_mults (1, 2, 2)."""
    return build_ddpm(batch, dtype, size=28, base_ch=32, ch_mults=(1, 2, 2))


def build_ddpmXL(batch, dtype):
    """The reference example's own U-Net scale (cont_ddpm.py:305-309: hidden
    64, dim_mults (1,2,4)) — 2-4x wider towers (~4x conv FLOPs) than the
    ddpm28 headline (2x at the first two levels, 4x at the deepest), so
    the conv GEMMs run at 0.5-1.0 MXU lane occupancy instead of 0.19-0.5
    (benchmarks/ddpm_roofline.py). Shows what MFU this framework reaches when
    the model's shapes stop capping the MXU."""
    return build_ddpm(batch, dtype, size=28, base_ch=64, ch_mults=(1, 2, 4))


def build_gan64(batch, dtype):
    """Reference-scale GAN: t_size 64 (reference sde_gan.py:440 scale; the
    plain 'gan' workload is the t_size=32 smoke shape)."""
    return build_gan(batch, dtype, t_size=64)


WORKLOADS = {"latent": build_latent, "ddpm": build_ddpm,
             "ddpm28": build_ddpm28, "ddpmXL": build_ddpmXL,
             "gan": build_gan, "gan64": build_gan64}


def measure(workload, batch, dtype_name, n_steps=16, platform=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[dtype_name]
    train_step, state, key = WORKLOADS[workload](batch, dtype)
    step = jax.jit(train_step)

    compiled = step.lower(state, key).compile()
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
        if workload != "latent":
            raise RuntimeError("cost_analysis unavailable and no analytic "
                               f"count for workload '{workload}'")
        flops = float(analytic_flops_per_step(batch))
        flops_src = "analytic"

    state, loss = step(state, key)
    float(loss)  # forces real execution (async backend)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, jax.random.fold_in(key, i))
    float(loss)  # one fetch at the end of the dependent chain
    sps = n_steps / (time.perf_counter() - t0)

    dev = jax.devices()[0]
    peak, kind = peak_for(dev)
    return dict(workload=workload, batch=batch, dtype=dtype_name,
                steps_per_sec=round(sps, 2),
                flops_per_step=flops, flops_src=flops_src,
                samples_per_sec=round(sps * batch, 1),
                mfu_pct=round(100.0 * flops * sps / peak, 3),
                device=kind, peak_tflops=peak / 1e12)


CONFIGS = {
    # batch 16384 f32 exceeds the 16G HBM of one v5e chip (measured 17.2G
    # with backprop residuals); the largest f32 config is 4096.
    "latent": [(1024, "float32"), (4096, "float32"),
               (1024, "bfloat16"), (16384, "bfloat16")],
    "ddpm": [(128, "float32"), (512, "float32"),
             (128, "bfloat16"), (512, "bfloat16")],
    "ddpm28": [(128, "float32"), (512, "float32"),
               (128, "bfloat16"), (512, "bfloat16")],
    "ddpmXL": [(256, "float32"), (256, "bfloat16"), (512, "bfloat16")],
    "gan": [(1024, "float32"), (1024, "bfloat16")],
    "gan64": [(1024, "float32"), (1024, "bfloat16")],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--workload", choices=[*WORKLOADS, "all"], default="all")
    args = ap.parse_args()
    names = list(WORKLOADS) if args.workload == "all" else [args.workload]
    rows = []
    for name in names:
        configs = CONFIGS[name] if not args.quick else [CONFIGS[name][0][:1]
                                                        + ("float32",)]
        for batch, dt in configs:
            r = measure(name, batch, dt,
                        platform="cpu" if args.cpu else None)
            rows.append(r)
            print(json.dumps(r))
    print()
    print("| workload | batch | dtype | steps/s | samples/s | GFLOPs/step | MFU % |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['workload']} | {r['batch']} | {r['dtype']} | "
              f"{r['steps_per_sec']} | {r['samples_per_sec']} | "
              f"{r['flops_per_step']/1e9:.2f} ({r['flops_src']}) | "
              f"{r['mfu_pct']} |")


if __name__ == "__main__":
    main()
