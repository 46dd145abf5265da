#!/usr/bin/env python
"""Pin the dw tail-stencil's VPU arithmetic floor (VERDICT r3 #1).

Round-4 A/B experiments on the real chip showed the 8.4 ms Pallas tail cost
is NOT in shift copies (hierarchical reuse: no change), NOT in the per-term
f32 converts (bf16 accumulate: SLOWER — the VPU's native path is f32), NOT
in kernel launches/DMA windows (3-block megakernel: no change). This
microbench decomposes the remaining candidate — the 25-term broadcast
multiply-accumulate chain itself — by timing three kernels at the exact
serving shape class (block13: bt=8, 32x32, 960ch, k=5):

  full      the real stencil (shifts + FMA chain)
  arith     the same 25-term FMA chain on UNSHIFTED operands (same op
            count, zero shift copies) — intentionally wrong math, timing
            only
  pass      expand-matmul + passthrough (no stencil at all)

(full - pass) is the stencil's total cost; (arith - pass) is its pure
arithmetic; their ratio says how much of the stencil is irreducible VPU
issue. Timing uses the honest host-materialization fence (bench.py's
rationale: block_until_ready reports early through the axon relay).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtg_card_image_segmentation_tpu.ops.pallas.fused_block import _shift2d

# bt=8 matches the production kernel's tiling. The 'full' variant at bt=8
# fails to compile: Mosaic requests 132M of register-allocator SPILL SLOTS
# (vs 128M physical VMEM) for the shifted 25-term chain — itself the key
# finding (the production kernel fits only because its windows are larger
# and spills smaller, but spill traffic is where the measured time beyond
# pure arithmetic goes). bt=4 is NOT a usable fallback: Mosaic emits a
# pathologically slower schedule at that shape (measured 10-20x slower on
# all three variants), so 'full' is simply reported as spill-bound here.
BT, H, W, CIN, CEXP, K, DIL = 8, 32, 32, 160, 960, 5, 2
B = 128


def make_kernel(mode: str):
    def kernel(x_ref, w_exp_ref, w_dw_ref, out_ref):
        x = x_ref[:]
        y = jnp.dot(
            x.reshape(BT * H * W, -1).astype(jnp.bfloat16),
            w_exp_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(BT, H, W, CEXP).astype(jnp.bfloat16)
        if mode == "pass":
            acc = y.astype(jnp.float32)
        else:
            acc = None
            ks = range(-(K - 1) // 2, (K - 1) // 2 + 1)
            for ix, dx in enumerate(ks):
                yc = (_shift2d(y, 0, dx * DIL)
                      if (dx and mode == "full") else y)
                for iy, dy in enumerate(ks):
                    xs_ = (_shift2d(yc, dy * DIL, 0)
                           if (dy and mode == "full") else yc)
                    term = xs_ * w_dw_ref[iy * K + ix][
                        None, None, None, :
                    ].astype(jnp.bfloat16)
                    term = term.astype(jnp.float32)
                    acc = term if acc is None else acc + term
        out_ref[:] = jnp.mean(acc, axis=-1, keepdims=True)  # tiny output

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(x, w_exp, w_dw, mode: str):
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 1), jnp.float32),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H, W, CIN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CIN, CEXP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, CEXP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, H, W, 1), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x, w_exp, w_dw)


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    w_exp = jnp.asarray(rng.standard_normal((CIN, CEXP)) * 0.05, jnp.float32)
    w_dw = jnp.asarray(rng.standard_normal((K * K, CEXP)) * 0.05, jnp.float32)

    results = {}
    for mode in ("pass", "arith", "full"):
        try:
            out = run(x, w_exp, w_dw, mode)  # compile
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{mode:6s}: DID NOT COMPILE ({msg})")
            continue
        _ = np.asarray(jnp.sum(out))
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x, w_exp, w_dw, mode)
        _ = np.asarray(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        results[mode] = dt * 1e3
        print(f"{mode:6s}: {dt * 1e3:.3f} ms")

    n_ops = B * H * W * CEXP * K * K  # FMA-chain terms
    if "arith" in results and "pass" in results:
        arith = results["arith"] - results["pass"]
        print(f"pure stencil arithmetic: {arith:.3f} ms per blk13-equivalent "
              f"-> {n_ops / (arith * 1e-3) / 1e12:.2f} T FMA-terms/s "
              f"(mult+convert+add per term)")
    if "full" in results and "pass" in results:
        stencil = results["full"] - results["pass"]
        print(f"stencil incl. shifts: {stencil:.3f} ms")


if __name__ == "__main__":
    main()
