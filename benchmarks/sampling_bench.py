"""Serving-path throughput: sample generation for all three model families.

Every committed number so far measures *training*; this harness measures the
inference/serving path — the thing a deployed model actually does:

* cont-DDPM: reverse-time SDE sampling (``ReverseDiffeqWrapper.sde_sample``,
  reference cont_ddpm.py:204-214) and the probability-flow ODE sampler
  (reference cont_ddpm.py:192-197, torchdiffeq rk4) — images/sec;
* SDE-GAN: generator path synthesis (reference sde_gan.py:118-144) — XLA scan
  vs the whole-solve fused kernel — paths/sec;
* latent SDE: prior path sampling (reference latent_sde_lorenz.py:163-169)
  — paths/sec.

Sampling is gradient-free, so these runs exercise the forward-only solver
path (no residual stashing, no adjoint) — a different regime from every
training table in BENCH_NOTES. Measurement protocol matches benchmarks/mfu.py:
jit once, warm up with a fetch, chain ``n_iters`` data-independent calls via
folded keys, one scalar fetch at the end (the tunneled TPU backend executes
asynchronously).

Usage: python benchmarks/sampling_bench.py [--cpu] [--workload ddpm|gan|latent|all]
       [--ref]   # add a reference-torchsde-on-host-CPU row (slow)
       [--json PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _measure(fn, key_base, n_iters):
    """steps/sec for a jitted ``fn(key) -> array`` over a chained key fold."""
    import jax
    import jax.numpy as jnp

    out = fn(key_base)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # drain (async backend)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n_iters):
        out = fn(jax.random.fold_in(key_base, i))
        # accumulate a scalar so iterations chain without a host round trip
        acc = acc + jnp.sum(jax.tree_util.tree_leaves(out)[0]) * 0
    float(acc)  # one fetch at the end of the dependent chain
    return n_iters / (time.perf_counter() - t0)


def bench_ddpm(dtype_name, batch, n_iters=8, dt=1e-2):
    """Reverse-SDE and probability-flow-ODE sampling at the BENCH_NOTES §1c
    headline U-Net config (28x28, base 32, ch_mults (1,2,2)); 1/dt solver
    steps through the full U-Net per sample batch."""
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.models.cont_ddpm import (ReverseDiffeqWrapper,
                                               ScoreMatchingSDE)
    from torchsde_tpu.models.unet import UNet

    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[dtype_name]
    key = jax.random.PRNGKey(0)
    denoiser = UNet(jax.random.fold_in(key, 2), in_ch=1, base_ch=32,
                    ch_mults=(1, 2, 2), dtype=dtype)
    sde = ScoreMatchingSDE(denoiser, input_size=(1, 28, 28))
    rev = ReverseDiffeqWrapper(sde)

    sde_fn = jax.jit(lambda k: rev.sde_sample_final(k, batch_size=batch, dt=dt))
    ode_fn = jax.jit(lambda k: rev.ode_sample(batch_size=batch, dt=dt, key=k))
    rows = []
    for name, fn in (("reverse-sde", sde_fn), ("prob-flow-ode", ode_fn)):
        sps = _measure(fn, key, n_iters)
        rows.append(dict(workload="ddpm28", sampler=name, batch=batch,
                         dtype=dtype_name, n_solver_steps=int(round(1.0 / dt)),
                         batches_per_sec=round(sps, 3),
                         samples_per_sec=round(sps * batch, 1)))
    return rows


def bench_gan(dtype_name, batch=1024, t_size=64, n_iters=32, paths=None):
    """Generator path synthesis at reference scale (sde_gan.py:440):
    reversible-Heun solve, dt=1 over t_size grid points."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchsde_tpu.models import sde_gan as G

    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[dtype_name]
    key = jax.random.PRNGKey(0)
    gen = G.Generator(jax.random.fold_in(key, 1), data_size=1,
                      initial_noise_size=5, noise_size=3, hidden_size=16,
                      mlp_size=16, num_layers=1, dtype=dtype)
    ts = np.arange(t_size, dtype=np.float64)

    rows = []
    on_tpu = jax.devices()[0].platform == "tpu"
    if paths is None:
        paths = (("xla", False),) + ((("fused", True),) if on_tpu else ())
    for path, fused in paths:
        fn = jax.jit(lambda k, f=fused: gen(k, ts, batch, dt=1.0,
                                            adjoint=False, fused=f))
        sps = _measure(fn, key, n_iters)
        rows.append(dict(workload="gan64", sampler=f"generator-{path}",
                         batch=batch, dtype=dtype_name, n_solver_steps=t_size - 1,
                         batches_per_sec=round(sps, 3),
                         samples_per_sec=round(sps * batch, 1)))
    return rows


def bench_latent(dtype_name, batch=1024, t_size=32, n_iters=32, dt=1.0 / 128):
    """Prior path sampling at the flagship config (bench.py shapes)."""
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.models.latent_sde import LatentSDE, sample_prior

    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[dtype_name]
    key = jax.random.PRNGKey(0)
    model = LatentSDE(jax.random.fold_in(key, 2), 3, 4, 64, 128, dtype=dtype)
    ts = jnp.linspace(0.0, 1.0, t_size)

    fn = jax.jit(lambda k: sample_prior(model, batch, ts, k, dt=dt))
    sps = _measure(fn, key, n_iters)
    return [dict(workload="latent", sampler="prior-sde", batch=batch,
                 dtype=dtype_name, n_solver_steps=int(round(1.0 / dt)),
                 batches_per_sec=round(sps, 3),
                 samples_per_sec=round(sps * batch, 1))]


def bench_ddpm_reference_cpu(batch=64, dt=1e-2, n_iters=2):
    """Reference torchsde reverse-SDE sampling on host CPU, same U-Net scale
    (reference cont_ddpm.py:204-214 with examples/unet.py). Slow: run with
    --ref only."""
    try:
        import importlib.util
        import types

        import benchmarks._trampoline_shim  # noqa: F401
        sys.path.insert(0, "/root/reference")
        import torch

        # The reference example imports CLI/data libs we neither have nor
        # need for the sampling path (fire/torchvision: main() only;
        # torchdiffeq: ode_sample only — we time sde_sample). Stub them so
        # the module imports.
        for name in ("fire", "torchdiffeq", "torchvision", "tqdm"):
            if name not in sys.modules:
                try:
                    __import__(name)
                except ImportError:
                    sys.modules[name] = types.ModuleType(name)
        try:
            import kornia  # noqa: F401
        except ImportError:
            # The reference U-Net's anti-aliased up/downsampling calls
            # kornia.filter2D in its forward pass; reproduce it (normalized
            # depthwise 2-D filter, same padding) so timings are faithful.
            def _filter2d(x, kernel, normalized=False):
                import torch.nn.functional as F
                k = kernel if kernel.dim() == 4 else kernel[:, None]
                if normalized:
                    k = k / k.sum()
                C = x.shape[1]
                k = k.expand(C, 1, *k.shape[-2:])
                pad = (k.shape[-2] // 2, k.shape[-1] // 2)
                return F.conv2d(x, k, padding=pad, groups=C)

            kornia_stub = types.ModuleType("kornia")
            kornia_stub.filter2D = _filter2d
            sys.modules["kornia"] = kornia_stub

        # Load the reference examples as an explicit package: our repo has its
        # own `examples/` directory, so a bare `import examples` is ambiguous.
        spec = importlib.util.spec_from_file_location(
            "ref_examples", "/root/reference/examples/__init__.py",
            submodule_search_locations=["/root/reference/examples"])
        ref_examples = importlib.util.module_from_spec(spec)
        sys.modules["ref_examples"] = ref_examples
        spec.loader.exec_module(ref_examples)
        from ref_examples import cont_ddpm as ref_cd  # type: ignore
        from ref_examples import unet as ref_unet  # type: ignore

        torch.manual_seed(0)
        with torch.no_grad():
            # The reference example's own model config (cont_ddpm.py:305-309:
            # hidden 64, dim_mults (1,2,4), 2 res blocks/level) — a ~4x larger
            # denoiser than our headline base-32 (1,2,2) U-Net, so this row is
            # reference-as-shipped context, not a same-net A/B.
            denoiser = ref_unet.Unet(
                input_size=(1, 28, 28), dim_mults=(1, 2, 4),
                attention_cls=ref_unet.LinearTimeSelfAttention)
            module = ref_cd.ScoreMatchingSDE(denoiser=denoiser,
                                             input_size=(1, 28, 28))
            rev = ref_cd.ReverseDiffeqWrapper(module)
            rev.sde_sample_final(batch_size=batch, dt=dt)  # warmup
            t0 = time.perf_counter()
            for _ in range(n_iters):
                rev.sde_sample_final(batch_size=batch, dt=dt)
            sps = n_iters / (time.perf_counter() - t0)
        return [dict(workload="ddpm28-reference-torch-cpu",
                     sampler="reverse-sde", batch=batch, dtype="float32",
                     n_solver_steps=int(round(1.0 / dt)),
                     batches_per_sec=round(sps, 4),
                     samples_per_sec=round(sps * batch, 2))]
    except Exception as e:  # pragma: no cover
        print(f"# reference sampling row unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return []


def scale_sweep(workload):
    """Batch-scaling sweep: §13's table fixes the serving batch at the
    training configs' sizes, which for the latency-bound families (GAN,
    latent) leaves most of the chip idle. Sweep the batch upward (at each
    family's recommended serving dtype/path from §13) until samples/s
    saturates — the committed peak is the honest 'one chip serves N/s'
    number."""
    rows = []
    if workload in ("gan", "all"):
        # §13 recommendation: XLA f32 path for forward-only generation.
        for batch in (1024, 4096, 16384, 65536, 262144):
            rows += bench_gan("float32", batch=batch,
                              n_iters=max(4, 32768 // max(1, batch // 32)),
                              paths=(("xla", False),))
    if workload in ("latent", "all"):
        for batch in (1024, 4096, 16384, 65536, 262144):
            rows += bench_latent("bfloat16", batch=batch,
                                 n_iters=max(4, 32768 // max(1, batch // 32)))
    if workload in ("ddpm", "all"):
        # Already compute-bound at 512 (§13 reading 1) — confirm the knee.
        for batch in (512, 1024, 2048):
            rows += bench_ddpm("bfloat16", batch, n_iters=4)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workload", choices=["ddpm", "gan", "latent", "all"],
                    default="all")
    ap.add_argument("--ref", action="store_true",
                    help="include reference-torchsde-on-CPU DDPM row (slow)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes / few iters (CPU smoke run)")
    ap.add_argument("--scale", action="store_true",
                    help="batch-scaling sweep to the per-chip serving peak")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rows = []
    if args.scale:
        rows = scale_sweep(args.workload)
        _report(rows, args.json)
        return
    if args.quick:
        if args.workload in ("ddpm", "all"):
            rows += bench_ddpm("float32", batch=8, n_iters=2, dt=0.1)
        if args.workload in ("gan", "all"):
            rows += bench_gan("float32", batch=32, t_size=8, n_iters=2)
        if args.workload in ("latent", "all"):
            rows += bench_latent("float32", batch=32, t_size=8, n_iters=2,
                                 dt=1.0 / 16)
    else:
        if args.workload in ("ddpm", "all"):
            for dt_name in ("float32", "bfloat16"):
                for batch in (64, 512):
                    rows += bench_ddpm(dt_name, batch)
        if args.workload in ("gan", "all"):
            for dt_name in ("float32", "bfloat16"):
                rows += bench_gan(dt_name)
        if args.workload in ("latent", "all"):
            for dt_name in ("float32", "bfloat16"):
                rows += bench_latent(dt_name)
    if args.ref:
        rows += bench_ddpm_reference_cpu()
    _report(rows, args.json)


def _report(rows, json_path):
    for r in rows:
        print(json.dumps(r))
    print()
    print("| workload | sampler | batch | dtype | solver steps | batches/s | samples/s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['workload']} | {r['sampler']} | {r['batch']} | "
              f"{r['dtype']} | {r['n_solver_steps']} | {r['batches_per_sec']} "
              f"| {r['samples_per_sec']} |")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
