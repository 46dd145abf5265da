#!/usr/bin/env python
"""Pin the stem + early-conv HBM floors (VERDICT r4 task 4).

The round-4 per-op roofline audit put the serving path's stem + early
expand/project 1x1 convs at "1-2x of HBM roofline (~4.3 ms of 21.4)" —
an estimate from dividing trace durations by nominal bytes/bandwidth,
never measured the way the VPU stencil floor was. This tool applies the
same floor-microbench discipline to the early ops:

  bw        measured achievable HBM stream bandwidth (bf16 copy at the
            block1-expanded size — the page-friendly best case)
  <op>      each early serving op ISOLATED in its own jit at the exact
            serving shape/dtype (512^2 b128, folded-BN bf16), fenced with
            a host materialization (bench.py rationale: block_until_ready
            reports early through the axon relay)

For each op the table reports measured ms, its pure-stream floor
(in+out bytes / measured bw), and the ratio. Ratio ~1 = the op IS at the
floor and only eliminating the traffic (fusion) can win; ratio >> 1 =
schedule slack worth attacking.

Run on the real chip: python tools/hbm_stream_floor.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B, S = 128, 512  # serving operating point
H2, H4 = S // 2, S // 4  # 256, 128


def _fence(x) -> None:
    np.asarray(jax.jit(jnp.sum)(x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x))


def _time(fn, args, iters: int) -> float:
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / iters


def _conv(x, w, b=None, stride=1, groups=1, act=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    k = w.shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    if act == "hardswish":
        y = y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    rng = np.random.default_rng(0)

    def t(shape, dtype=jnp.bfloat16):
        if dtype == jnp.uint8:
            return jnp.asarray(rng.integers(0, 256, shape), jnp.uint8)
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dtype)

    # ---- measured stream bandwidth: bf16 copy of the block1-expanded map
    big = t((B, H2, H2, 64))  # 1.07 GB bf16

    @jax.jit
    def copy(x):
        return x * jnp.bfloat16(1.0001)

    dt = _time(copy, (big,), args.iters)
    nbytes = big.size * 2 * 2  # read + write
    bw = nbytes / dt
    print(f"bw      : {dt * 1e3:7.3f} ms for {nbytes / 1e9:.2f} GB moved "
          f"-> {bw / 1e9:.0f} GB/s effective")

    ops = []

    # stem: u8 512^2x3 -> conv3x3 s2 (norm folded) + hardswish -> bf16 256^2x16
    x_u8 = t((B, S, S, 3), jnp.uint8)
    w_stem = t((3, 3, 3, 16), jnp.float32)
    b_stem = t((16,), jnp.float32)

    @jax.jit
    def stem(x, w, b):
        xf = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        return _conv(xf, w.astype(jnp.bfloat16), b, stride=2, act="hardswish")

    ops.append(("stem u8->16@256^2", stem, (x_u8, w_stem, b_stem),
                x_u8.size * 1 + B * H2 * H2 * 16 * 2))

    # block0: dw3x3 16ch @256^2 relu + project 16->16 + residual
    x0 = t((B, H2, H2, 16))
    wd0, bd0 = t((3, 3, 1, 16), jnp.float32), t((16,), jnp.float32)
    wp0, bp0 = t((1, 1, 16, 16), jnp.float32), t((16,), jnp.float32)

    @jax.jit
    def block0(x, wd, bd, wp, bp):
        y = _conv(x, wd.astype(jnp.bfloat16), bd, groups=16, act="relu")
        y = _conv(y, wp.astype(jnp.bfloat16), bp)
        return y + x

    ops.append(("block0 dw+proj 16@256^2", block0, (x0, wd0, bd0, wp0, bp0),
                2 * x0.size * 2))

    # block1 expand 1x1 16->64 @256^2 (+relu)
    we1, be1 = t((1, 1, 16, 64), jnp.float32), t((64,), jnp.float32)

    @jax.jit
    def b1_expand(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b, act="relu")

    ops.append(("block1 expand 16->64@256^2", b1_expand, (x0, we1, be1),
                (x0.size + B * H2 * H2 * 64) * 2))

    # block1 dw 3x3 s2 64ch 256^2 -> 128^2 (+relu)
    x1e = t((B, H2, H2, 64))
    wd1, bd1 = t((3, 3, 1, 64), jnp.float32), t((64,), jnp.float32)

    @jax.jit
    def b1_dw(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b, stride=2, groups=64, act="relu")

    ops.append(("block1 dw s2 64@256^2", b1_dw, (x1e, wd1, bd1),
                (x1e.size + B * H4 * H4 * 64) * 2))

    # block1 project 64->24 @128^2
    x1d = t((B, H4, H4, 64))
    wp1, bp1 = t((1, 1, 64, 24), jnp.float32), t((24,), jnp.float32)

    @jax.jit
    def b1_proj(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b)

    ops.append(("block1 proj 64->24@128^2", b1_proj, (x1d, wp1, bp1),
                (x1d.size + B * H4 * H4 * 24) * 2))

    # block2 whole: expand 24->72 relu, dw3x3 72, proj 72->24, residual @128^2
    x2 = t((B, H4, H4, 24))
    we2, be2 = t((1, 1, 24, 72), jnp.float32), t((72,), jnp.float32)
    wd2, bd2 = t((3, 3, 1, 72), jnp.float32), t((72,), jnp.float32)
    wp2, bp2 = t((1, 1, 72, 24), jnp.float32), t((24,), jnp.float32)

    @jax.jit
    def block2(x, we, be, wd, bd, wp, bp):
        y = _conv(x, we.astype(jnp.bfloat16), be, act="relu")
        y = _conv(y, wd.astype(jnp.bfloat16), bd, groups=72, act="relu")
        y = _conv(y, wp.astype(jnp.bfloat16), bp)
        return y + x

    # floor if XLA fuses everything: in + out only; the expanded 72-ch map
    # materializing twice shows up as ratio >> 1 against THIS floor
    ops.append(("block2 e+dw+p 24/72@128^2 (floor=io only)", block2,
                (x2, we2, be2, wd2, bd2, wp2, bp2), 2 * x2.size * 2))
    # same floor including one expanded round trip (what XLA usually does)
    ops.append(("block2 (floor=io+2x expanded)", block2,
                (x2, we2, be2, wd2, bd2, wp2, bp2),
                2 * x2.size * 2 + 2 * B * H4 * H4 * 72 * 2 * 2))

    # hardswish-materialization probe: 1x1 conv 16->64 with/without act
    @jax.jit
    def conv_noact(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b)

    ops.append(("probe conv16->64 no act", conv_noact, (x0, we1, be1),
                (x0.size + B * H2 * H2 * 64) * 2))

    @jax.jit
    def conv_hs(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b, act="hardswish")

    ops.append(("probe conv16->64 +hardswish", conv_hs, (x0, we1, be1),
                (x0.size + B * H2 * H2 * 64) * 2))

    print(f"{'op':44s} {'ms':>8s} {'floor':>8s} {'ratio':>6s}")
    for name, fn, a, floor_bytes in ops:
        try:
            dt = _time(fn, a, args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s}  FAILED: {str(e).splitlines()[0][:80]}")
            continue
        floor_ms = floor_bytes / bw * 1e3
        print(f"{name:44s} {dt * 1e3:8.3f} {floor_ms:8.3f} "
              f"{dt * 1e3 / floor_ms:6.2f}")


if __name__ == "__main__":
    main()
