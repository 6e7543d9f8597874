"""Shape-derived MXU roofline for the cont-DDPM U-Net train step.

BENCH_NOTES §10 measured the 28x28 U-Net at 20.6% MFU (bf16, batch 512) and
attributed the gap to "conv-shape tiling (1-channel input, 32-64-wide towers)"
without quantifying it. This script derives the *achievable* peak for the
actual conv shapes and compares measured MFU against that cap instead of the
absolute chip peak, answering "is 20.6% near the shape roofline or is there a
findable kernel win?".

Model: a TPU MXU tile is 128 lanes wide. A conv lowered to implicit GEMM
(M = B*H*W spatial rows, K = kh*kw*C_in contraction, N = C_out lanes) can use
at most min(N,128)/128 of the MXU's output lanes — a structural cap no kernel
can beat without changing the computation's shape. Per conv we count three
GEMMs of one train step:

* forward:  N = C_out                    (lanes capped by C_out)
* dgrad:    N = C_in                     (lanes capped by C_in)
* wgrad:    N = C_out, K = B*H*W         (lanes capped by C_out; its huge
                                          contraction depth pipelines fully)

and K-dimension padding: the MXU multiplies 128-deep blocks, so contraction
depth K uses ceil(K/128)*128 cycles — depth efficiency K/(ceil(K/128)*128).
M (spatial) rows pipeline at 8/tile and are effectively free at these sizes.
Matmuls (time-emb MLPs, attention) are counted the same way.

The achievable cap is the FLOP-weighted harmonic mean of per-GEMM efficiency:
   cap = total_flops / sum_i (flops_i / eff_i),   eff_i = lane_eff * depth_eff

Known omissions (both make the cap OPTIMISTIC, i.e. the true achievable
number is lower): the attention score/value einsums (M=B*49, N<=49 at the
7x7 bottleneck — tiny FLOP share), and all VPU/bandwidth work (GroupNorm
reductions, silu, residual adds, transposes) which contributes zero MXU
FLOPs but real wall-clock. "Measured at X% of the shape cap" therefore
reads as a lower bound on how close the kernels are to speed-of-light.

Usage: python benchmarks/ddpm_roofline.py [--batch 512] [--size 28]
       [--base-ch 32] [--ch-mults 1,2,2]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gemm_eff(m, k, n, lanes=128, depth=128):
    """MXU efficiency for an (M,K)@(K,N) GEMM: lane occupancy x depth padding."""
    lane_eff = min(n, lanes) / lanes if n < lanes else 1.0
    # multiples of `lanes` tile perfectly; ragged tails cost their padding
    if n > lanes and n % lanes:
        lane_eff = n / (math.ceil(n / lanes) * lanes)
    depth_eff = k / (math.ceil(k / depth) * depth)
    return lane_eff * depth_eff


def record_shapes(batch, size, base_ch, ch_mults):
    """eval_shape-trace one loss computation, recording every conv/linear GEMM."""
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.models import unet as unet_mod
    from torchsde_tpu.models import layers as layers_mod
    from torchsde_tpu.models.cont_ddpm import ScoreMatchingSDE

    records = []

    orig_conv = unet_mod.Conv2d.__call__
    orig_lin = layers_mod.Linear.__call__

    def conv_call(self, x):
        B, H, W, Cin = x.shape
        Cout = self.w.shape[-1]
        ks = self.ksize
        # same-padding strided conv: output dims are ceil(H/stride), not floor
        Ho, Wo = math.ceil(H / self.stride), math.ceil(W / self.stride)
        records.append(dict(kind="conv", B=B, HW=Ho * Wo, K=ks * ks * Cin,
                            N=Cout, Cin=Cin, Cout=Cout, ksize=ks,
                            res=f"{H}x{W}"))
        return orig_conv(self, x)

    def lin_call(self, x):
        records.append(dict(kind="linear", B=int(x.size // x.shape[-1]), HW=1,
                            K=int(x.shape[-1]), N=int(self.w.shape[1]),
                            Cin=int(x.shape[-1]), Cout=int(self.w.shape[1]),
                            ksize=0, res="-"))
        return orig_lin(self, x)

    unet_mod.Conv2d.__call__ = conv_call
    layers_mod.Linear.__call__ = lin_call
    try:
        key = jax.random.PRNGKey(0)
        denoiser = unet_mod.UNet(key, in_ch=1, base_ch=base_ch,
                                 ch_mults=tuple(ch_mults))
        sde = ScoreMatchingSDE(denoiser, input_size=(1, size, size))
        x = jnp.zeros((batch, 1, size, size))
        jax.eval_shape(lambda s: s.loss(jax.random.PRNGKey(1), x), sde)
    finally:
        unet_mod.Conv2d.__call__ = orig_conv
        layers_mod.Linear.__call__ = orig_lin
    return records


def analyse(records):
    """Per-GEMM FLOPs and efficiency for fwd + dgrad + wgrad of each op."""
    rows = []
    for r in records:
        m = r["B"] * r["HW"]
        flops = 2.0 * m * r["K"] * r["N"]
        fwd = (flops, gemm_eff(m, r["K"], r["N"]))
        # dgrad: same FLOPs, output lanes = the *input* channels
        k_d = (r["ksize"] ** 2 or 1) * r["Cout"]
        dgrad = (flops, gemm_eff(m, k_d, r["Cin"]))
        # wgrad: contraction over spatial rows, output lanes = C_out
        wgrad = (flops, gemm_eff(r["K"], m, r["N"]))
        rows.append(dict(**r, flops_fwd=flops,
                         effs=dict(fwd=fwd, dgrad=dgrad, wgrad=wgrad)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--size", type=int, default=28)
    ap.add_argument("--base-ch", type=int, default=32)
    ap.add_argument("--ch-mults", default="1,2,2")
    ap.add_argument("--measured-mfu", type=float, default=None,
                    help="measured MFU %% (e.g. 20.6 from BENCH_NOTES §10) "
                         "to report as a fraction of the shape cap")
    args = ap.parse_args()
    mults = tuple(int(x) for x in args.ch_mults.split(","))

    records = record_shapes(args.batch, args.size, args.base_ch, mults)
    rows = analyse(records)

    total = 0.0
    weighted_cost = 0.0
    print("| op | res | MxKxN (fwd) | GFLOPs (x3) | eff fwd | eff dgrad | eff wgrad |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        m = r["B"] * r["HW"]
        per_op = 0.0
        per_cost = 0.0
        for name, (fl, eff) in r["effs"].items():
            per_op += fl
            per_cost += fl / max(eff, 1e-9)
        total += per_op
        weighted_cost += per_cost
        print(f"| {r['kind']}{r['ksize'] or ''} {r['Cin']}->{r['Cout']} | "
              f"{r['res']} | {m}x{r['K']}x{r['N']} | "
              f"{3 * r['flops_fwd'] / 1e9:.2f} | "
              f"{r['effs']['fwd'][1]:.2f} | {r['effs']['dgrad'][1]:.2f} | "
              f"{r['effs']['wgrad'][1]:.2f} |")

    cap = total / weighted_cost
    out = dict(batch=args.batch, size=args.size, base_ch=args.base_ch,
               ch_mults=mults, gemm_gflops_per_step=round(total / 1e9, 2),
               shape_achievable_mfu_pct=round(100 * cap, 1))
    if args.measured_mfu:
        out["measured_mfu_pct"] = args.measured_mfu
        out["fraction_of_shape_cap"] = round(args.measured_mfu / (100 * cap), 3)
    print()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
