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

``build_ops()`` exposes the op list as (name, jitfn, arg_specs,
floor_bytes) with *shape specs* rather than live buffers so that
tools/perf_train_daemon.py can AOT-compile every op during a training run
(avals only, no device memory) and execute the timed loops later on the
idle chip.

Run on the real chip: python tools/hbm_stream_floor.py [--iters 30]
"""

from __future__ import annotations

import argparse
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


# arg spec helpers: (shape, dtype) pairs, materialized by make_args
_BF = jnp.bfloat16
_F32 = jnp.float32
_U8 = jnp.uint8


def build_ops():
    """The early-serving-op floor suite as lazily-materialized specs.

    Returns [(name, jitted_fn, arg_specs, floor_bytes), ...] where
    arg_specs is a tuple of (shape, dtype). The FIRST entry is the
    bandwidth reference ("bw"): its measured time defines the stream
    bandwidth the floors divide by (floor_bytes = bytes moved).
    """
    ops = []

    # ---- measured stream bandwidth: bf16 copy of the block1-expanded map
    @jax.jit
    def copy(x):
        return x * jnp.bfloat16(1.0001)

    big_spec = ((B, H2, H2, 64), _BF)  # 1.07 GB bf16
    ops.append(("bw", copy, (big_spec,), B * H2 * H2 * 64 * 2 * 2))

    # stem: u8 512^2x3 -> conv3x3 s2 (norm folded) + hardswish -> bf16 256^2x16
    @jax.jit
    def stem(x, w, b):
        xf = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        return _conv(xf, w.astype(jnp.bfloat16), b, stride=2, act="hardswish")

    ops.append(("stem u8->16@256^2", stem,
                (((B, S, S, 3), _U8), ((3, 3, 3, 16), _F32), ((16,), _F32)),
                B * S * S * 3 * 1 + B * H2 * H2 * 16 * 2))

    # block0: dw3x3 16ch @256^2 relu + project 16->16 + residual
    @jax.jit
    def block0(x, wd, bd, wp, bp):
        y = _conv(x, wd.astype(jnp.bfloat16), bd, groups=16, act="relu")
        y = _conv(y, wp.astype(jnp.bfloat16), bp)
        return y + x

    x0_spec = ((B, H2, H2, 16), _BF)
    ops.append(("block0 dw+proj 16@256^2", block0,
                (x0_spec, ((3, 3, 1, 16), _F32), ((16,), _F32),
                 ((1, 1, 16, 16), _F32), ((16,), _F32)),
                2 * B * H2 * H2 * 16 * 2))

    # block1 expand 1x1 16->64 @256^2 (+relu)
    @jax.jit
    def b1_expand(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b, act="relu")

    e1_specs = (x0_spec, ((1, 1, 16, 64), _F32), ((64,), _F32))
    ops.append(("block1 expand 16->64@256^2", b1_expand, e1_specs,
                (B * H2 * H2 * 16 + B * H2 * H2 * 64) * 2))

    # block1 dw 3x3 s2 64ch 256^2 -> 128^2 (+relu)
    @jax.jit
    def b1_dw(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b, stride=2, groups=64, act="relu")

    ops.append(("block1 dw s2 64@256^2", b1_dw,
                (((B, H2, H2, 64), _BF), ((3, 3, 1, 64), _F32), ((64,), _F32)),
                (B * H2 * H2 * 64 + B * H4 * H4 * 64) * 2))

    # block1 project 64->24 @128^2
    @jax.jit
    def b1_proj(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b)

    ops.append(("block1 proj 64->24@128^2", b1_proj,
                (((B, H4, H4, 64), _BF), ((1, 1, 64, 24), _F32), ((24,), _F32)),
                (B * H4 * H4 * 64 + B * H4 * H4 * 24) * 2))

    # block2 whole: expand 24->72 relu, dw3x3 72, proj 72->24, residual @128^2
    @jax.jit
    def block2(x, we, be, wd, bd, wp, bp):
        y = _conv(x, we.astype(jnp.bfloat16), be, act="relu")
        y = _conv(y, wd.astype(jnp.bfloat16), bd, groups=72, act="relu")
        y = _conv(y, wp.astype(jnp.bfloat16), bp)
        return y + x

    b2_specs = (((B, H4, H4, 24), _BF),
                ((1, 1, 24, 72), _F32), ((72,), _F32),
                ((3, 3, 1, 72), _F32), ((72,), _F32),
                ((1, 1, 72, 24), _F32), ((24,), _F32))
    # floor if XLA fuses everything: in + out only; the expanded 72-ch map
    # materializing twice shows up as ratio >> 1 against THIS floor
    ops.append(("block2 e+dw+p 24/72@128^2 (floor=io only)", block2, b2_specs,
                2 * B * H4 * H4 * 24 * 2))
    # same floor including one expanded round trip (what XLA usually does)
    ops.append(("block2 (floor=io+2x expanded)", block2, b2_specs,
                2 * B * H4 * H4 * 24 * 2 + 2 * B * H4 * H4 * 72 * 2 * 2))

    # hardswish-materialization probe: 1x1 conv 16->64 with/without act
    @jax.jit
    def conv_noact(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b)

    ops.append(("probe conv16->64 no act", conv_noact, e1_specs,
                (B * H2 * H2 * 16 + B * H2 * H2 * 64) * 2))

    @jax.jit
    def conv_hs(x, w, b):
        return _conv(x, w.astype(jnp.bfloat16), b, act="hardswish")

    ops.append(("probe conv16->64 +hardswish", conv_hs, e1_specs,
                (B * H2 * H2 * 16 + B * H2 * H2 * 64) * 2))

    return ops


def make_args(specs, rng):
    out = []
    for shape, dtype in specs:
        if dtype == jnp.uint8:
            out.append(jnp.asarray(rng.integers(0, 256, shape), jnp.uint8))
        else:
            out.append(jnp.asarray(rng.standard_normal(shape) * 0.1, dtype))
    return tuple(out)


def run_suite(iters: int, runner=None, out=print, ops=None) -> None:
    """Measure every op and print the floor table.

    ``runner(fn, args, iters) -> seconds`` defaults to the in-module timed
    loop; the perf daemon passes one that uses its AOT-compiled programs
    (and the matching ``ops`` list it compiled from — build_ops() makes
    fresh fn objects each call, so identity lookups need the same list).
    """
    rng = np.random.default_rng(0)
    runner = runner or _time
    ops = ops if ops is not None else build_ops()

    name, fn, specs, nbytes = ops[0]
    args = make_args(specs, rng)
    dt = runner(fn, args, iters)
    del args
    bw = nbytes / dt
    out(f"bw      : {dt * 1e3:7.3f} ms for {nbytes / 1e9:.2f} GB moved "
        f"-> {bw / 1e9:.0f} GB/s effective")

    out(f"{'op':44s} {'ms':>8s} {'floor':>8s} {'ratio':>6s}")
    for name, fn, specs, floor_bytes in ops[1:]:
        args = make_args(specs, rng)
        try:
            dt = runner(fn, args, iters)
        except Exception as e:  # noqa: BLE001
            out(f"{name:44s}  FAILED: {str(e).splitlines()[0][:80]}")
            continue
        finally:
            del args
        floor_ms = floor_bytes / bw * 1e3
        out(f"{name:44s} {dt * 1e3:8.3f} {floor_ms:8.3f} "
            f"{dt * 1e3 / floor_ms:6.2f}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()
    run_suite(args.iters)


if __name__ == "__main__":
    main()
