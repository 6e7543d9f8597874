"""Headline benchmark: latent-SDE training throughput (steps/sec/chip).

Matches the BASELINE.md flagship config (latent_sde_lorenz-style model with
logqp KL channel, adjoint gradients, batch 1024). The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is measured against the *reference
implementation itself* (google-research/torchsde) running the same model
shape/batch/solver on this host's CPU with torch — the only hardware both
implementations can share here. (torchsde has no TPU backend; torch here is
CPU-only.)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
"""

import json
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
N_STEPS = 20


def bench_ours():
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss

    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, T1, T_SIZE)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T_SIZE, BATCH, DATA))
    model = LatentSDE(jax.random.fold_in(key, 2), DATA, LATENT, CTX, HIDDEN)

    def loss_fn(model, xs, key):
        loss, _ = latent_sde_loss(model, xs, ts, key, dt=DT)
        return loss

    @jax.jit
    def train_step(model, xs, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, xs, key)
        model = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, model, grads)
        return model, loss

    # The axon TPU tunnel executes asynchronously and block_until_ready does
    # not wait, so: chain N data-dependent steps (the device must run them
    # serially) and force ONE scalar fetch at the end; subtract the fetch
    # round-trip measured separately.
    model, loss = train_step(model, xs, key)  # compile + warmup
    float(loss)
    t0 = time.perf_counter()
    float(jnp.asarray(0.0) + 0.0)
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(N_STEPS):
        model, loss = train_step(model, xs, jax.random.fold_in(key, i))
    float(loss)
    elapsed = max(time.perf_counter() - t0 - rtt, 1e-9)
    return N_STEPS / elapsed, jax.devices()[0].platform


def bench_reference_cpu(n_steps=3):
    """The reference torchsde (from /root/reference) on torch-CPU, same model
    shape and solver config. Returns steps/sec or None if unavailable."""
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
            zs, log_ratio = torchsde.sdeint_adjoint(
                sde, z0, ts, dt=DT, logqp=True, method="euler",
                adjoint_method="milstein")
            _xs = sde.projector(zs)
            loss = ((_xs - xs) ** 2).mean() + log_ratio.sum(0).mean()
            loss.backward()
            opt.step()

        step()  # warmup
        t0 = time.perf_counter()
        for _ in range(n_steps):
            step()
        return n_steps / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# reference baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def main():
    ours, platform = bench_ours()
    ref = bench_reference_cpu()
    vs = (ours / ref) if ref else None
    print(json.dumps({
        "metric": f"latent-SDE logqp adjoint train steps/sec (batch {BATCH}, "
                  f"{platform} chip) vs torchsde-reference on host CPU",
        "value": round(ours, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
