"""Fused MobileNetV3 inverted-residual block as one Pallas kernel.

The expand(1x1) -> depthwise(kxk) -> [SE] -> project(1x1) block is the
backbone's bandwidth hog: XLA must materialize the EXPANDED activation
(up to 6x wider than the block IO) to HBM twice between the convs. This
kernel keeps the whole per-image feature map VMEM-resident:

- 1x1 convs become (H*W, Cin) @ (Cin, Cexp) MXU matmuls,
- the depthwise kxk stencil is k^2 shifted multiplies on the VPU
  (`pltpu.roll` + edge masks — zero padding, torch alignment),
- stride 2 takes every other row/col of the full-res stencil (exactly the
  torch pad=(k-1)//2 convention),
- SE is a spatial mean + two tiny matmuls + hardsigmoid gate, in-register.

HBM traffic per block drops from (in + 2*expanded + out) to (in + out).
The grid batches as many images per step as fit the VMEM budget
(shape-adaptive tiling, `_grid_batch`); blocks whose per-image maps exceed
VMEM have no valid tiling and raise ValueError (callers fall back to XLA
per block). Folded (BN-free) weights only: use export.fold_bn first.
Golden-tested against models.layers.InvertedResidual in
tests/test_pallas_fused_block.py.

STATUS (measured on the real v5e): correctness-validated (maxdiff ~1.6e-2,
bf16 expanded path). Where it WINS: the three dilated-tail blocks at
512x512 serving (32x32 maps, ~250 MB expanded tensors in the XLA path) —
fusing them saves ~2.7 ms e2e, and serving/predictor.py runs them through
this kernel (FUSED_BLOCKS = (12, 13, 14)). Where it LOSES: large-spatial
blocks — the in-kernel VPU stencil costs more than the saved HBM traffic
(e.g. block1 @320x240 B128: 11.1 ms vs XLA 11.0) — those stay on XLA
convs. See serving/predictor.py:74-80 for the measured serving policy.

Tried and rejected (don't re-try): replacing the shift/concat stencil with
static slices of a zero-padded **f32** VMEM scratch. An isolated microbench
fenced with block_until_ready() showed blk13 4.36 -> 0.54 ms, but
block_until_ready reports EARLY through the axon relay (bench.py's warning
applies to kernels too — always fence with a host materialization);
a device-trace profile of the real serving program showed the scratch
variant is SLOWER in context (pallas blocks 9.7 ms vs 8.4, e2e 25.8 vs
24.4 ms @512x512 b128): the f32 scratch halves images-per-step (VMEM) and
the zero-fill + staging store add VPU work that the saved per-term
converts don't pay back.

Round 4 revisits that result with a **bf16** padded scratch
(``stencil="scratch"``): the expand matmul writes straight into the
interior of a zero-border (bt, H+2p, W+2p, Cexp) bf16 scratch, and each of
the k^2 taps becomes a static-offset slice load fused into the FMA — no
concat materializations at all (the concat path moves the full expanded
tensor ~2 times per tap). bf16 keeps the footprint close to the unpadded
activation (so images-per-step does NOT halve, unlike the f32 attempt),
and at dilation 2 every slice offset is even, matching the bf16 sublane
packing granularity of 2. Stride-1 blocks only (the serving tail is all
stride 1); stride-2 keeps the concat path.

ROUND-4 ROOFLINE VERDICT (every number measured e2e on the real v5e via
bench.py @512^2 b128; concat baseline 22.36 ms / 5,724 img/s):

1. bf16 scratch + static-slice taps: 25.60 ms. The padded scratch + fp32
   accumulator still halves images-per-step (8 -> 4 by VMEM accounting);
   grid overhead eats the saved copies. Kept opt-in.
2. Hierarchical shift reuse (rows-outer 22.65 ms; columns-outer 22.69 ms
   — k sublane-crossing copies instead of k^2): NO change. The concat
   shifts are not where the time is.
3. bf16 accumulation, one final convert (MTG_DW_ACC=bfloat16): 24.60 ms —
   SLOWER. The VPU's native elementwise path is f32; bf16 adds pay
   pack/unpack, so the 25 per-term converts were never the cost either.
4. 3-block megakernel (fused_tail_chain, now the serving default):
   22.30 ms — launches/DMA windows were ~0.3% of step time.

What remains is the arithmetic itself, pinned by tools/vpu_stencil_floor.py
(same shapes, honest fence): the 25-term broadcast multiply-accumulate
chain WITHOUT any shifts costs 1.80 ms per block13-equivalent — a measured
1.75e12 FMA-terms/s VPU issue rate (each term = bf16 multiply + f32
convert + f32 add). Scaled to the three tail blocks (672+960+960 channels)
that is ~4.9 ms of pure, shift-free arithmetic; the expand/project MXU
matmuls measured 1.29 ms in the same harness ('pass' variant, x3 blocks
~2 ms with project), plus SE reductions and residuals. The 8.4 ms trace
figure therefore sits within ~1.2x of the measured-component sum, and the
microbench's 'full' variant shows where that last fraction lives: Mosaic's
register allocator requests 132 MB of spill slots for the shifted chain
(vs 128 MB physical VMEM) — spill traffic, not a schedulable op. The
README's earlier "~6 ms roofline" assumed 2 ops/term; the VPU executes 3
(multiply, convert, add) and bf16-native accumulate is measured slower,
so ~8 ms IS the speed of light for this op sequence on this VPU. Further
gains require changing the op sequence itself (e.g. an architecture whose
tail is not depthwise), not the schedule.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift (..., H, W, C) over the H/W axes by (dy, dx) with zero fill —
    out[..., i, j, :] = x[..., i+dy, j+dx, :].

    Implemented with static slice + concat (Mosaic's rotate only supports
    32-bit data; slices/concats work for bf16 too)."""
    ha, wa = x.ndim - 3, x.ndim - 2
    idx = [slice(None)] * x.ndim

    def cut(arr, axis, sl):
        s = list(idx)
        s[axis] = sl
        return arr[tuple(s)]

    if dy > 0:
        x = jnp.concatenate(
            [cut(x, ha, slice(dy, None)), jnp.zeros_like(cut(x, ha, slice(0, dy)))],
            axis=ha,
        )
    elif dy < 0:
        x = jnp.concatenate(
            [jnp.zeros_like(cut(x, ha, slice(dy, None))), cut(x, ha, slice(0, dy))],
            axis=ha,
        )
    if dx > 0:
        x = jnp.concatenate(
            [cut(x, wa, slice(dx, None)), jnp.zeros_like(cut(x, wa, slice(0, dx)))],
            axis=wa,
        )
    elif dx < 0:
        x = jnp.concatenate(
            [jnp.zeros_like(cut(x, wa, slice(dx, None))), cut(x, wa, slice(0, dx))],
            axis=wa,
        )
    return x


def _act(x: jax.Array, name: Optional[str]) -> jax.Array:
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "hardswish":
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    return x


def _make_kernel(bt: int, h: int, w: int, k: int, stride: int, act: str,
                 has_expand: bool, has_se: bool, residual: bool,
                 dilation: int = 1, use_scratch: bool = False,
                 acc_dtype: str = "float32"):
    offsets = [
        (dy * dilation, dx * dilation)
        for dy in range(-(k - 1) // 2, (k - 1) // 2 + 1)
        for dx in range(-(k - 1) // 2, (k - 1) // 2 + 1)
    ]
    # torch pad=(k-1)//2*dilation keeps H/W: the shifts cover it exactly
    pad = (k - 1) // 2 * dilation

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        if has_expand:
            w_exp_ref, b_exp_ref = refs[i], refs[i + 1]; i += 2
        w_dw_ref, b_dw_ref = refs[i], refs[i + 1]; i += 2
        if has_se:
            w1_ref, b1_ref, w2_ref, b2_ref = refs[i : i + 4]; i += 4
        w_proj_ref, b_proj_ref = refs[i], refs[i + 1]; i += 2
        out_ref = refs[i]; i += 1
        pad_ref = refs[i] if use_scratch else None

        # expanded path runs in bf16 to fit VMEM (whole-image residency);
        # matmuls still accumulate fp32 on the MXU. ``bt`` images per grid
        # step: amortizes per-step DMA/launch overhead (at 32x32 tail maps a
        # per-image grid spends more time stepping than computing) and makes
        # the flattened (bt*h*w) sublane dim a multiple of 8 at operating
        # points where h*w alone is not (e.g. 320x240 -> 300).
        x = x_ref[:]  # (bt, H, W, Cin)
        if has_expand:
            y = jnp.dot(
                x.reshape(bt * h * w, -1).astype(jnp.bfloat16),
                w_exp_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + b_exp_ref[:]
            y = _act(y, act).reshape(bt, h, w, -1).astype(jnp.bfloat16)
        else:
            y = x.astype(jnp.bfloat16)

        # depthwise kxk stencil at full resolution (bf16 terms, fp32 acc)
        acc = None
        if use_scratch:
            # stage y into the interior of the zero-border padded scratch;
            # every tap then reads a static-offset slice (fused load+FMA,
            # no concat materializations). Borders are zeroed each grid
            # step (fresh images), interior is fully overwritten.
            zrow = jnp.zeros((bt, pad, w + 2 * pad, y.shape[-1]), jnp.bfloat16)
            zcol = jnp.zeros((bt, h, pad, y.shape[-1]), jnp.bfloat16)
            pad_ref[:, :pad, :, :] = zrow
            pad_ref[:, h + pad:, :, :] = zrow
            pad_ref[:, pad:h + pad, :pad, :] = zcol
            pad_ref[:, pad:h + pad, w + pad:, :] = zcol
            pad_ref[:, pad:h + pad, pad:w + pad, :] = y
            for idx, (dy, dx) in enumerate(offsets):
                oy, ox = dy + pad, dx + pad  # slice starts in the padded map
                term = (
                    pad_ref[:, oy:oy + h, ox:ox + w, :]
                    * w_dw_ref[idx][None, None, None, :].astype(jnp.bfloat16)
                ).astype(jnp.float32)
                acc = term if acc is None else acc + term
        else:
            # hierarchical shifts, COLUMN-major: a W-axis shift crosses the
            # sublane tiling (expensive realignment copy) while an H-axis
            # shift is a plain address-offset copy — so shift columns ONCE
            # per dx (k copies total, not k^2) and reuse across the k cheap
            # row offsets. Same zero-fill semantics as the combined shift.
            ks = range(-(k - 1) // 2, (k - 1) // 2 + 1)
            for ix, dx in enumerate(ks):
                yc = _shift2d(y, 0, dx * dilation) if dx else y
                for iy, dy in enumerate(ks):
                    xs_ = _shift2d(yc, dy * dilation, 0) if dy else yc
                    term = xs_ * w_dw_ref[iy * k + ix][
                        None, None, None, :
                    ].astype(jnp.bfloat16)
                    if acc_dtype == "float32":
                        term = term.astype(jnp.float32)
                    acc = term if acc is None else acc + term
            acc = acc.astype(jnp.float32)
        if stride == 2:
            # Mosaic supports neither [::2] gathers nor strided slices;
            # decimate via reshape + iota-masked sum (constants can't be
            # closure-captured in pallas kernels, so build the mask in-kernel)
            bb, hh, ww, cc = acc.shape
            r = acc.reshape(bb, hh // 2, 2, ww, cc)
            keep = jax.lax.broadcasted_iota(jnp.int32, r.shape, 2) == 0
            acc = jnp.where(keep, r, 0.0).sum(2)
            r = acc.reshape(bb, hh // 2, ww // 2, 2, cc)
            keep = jax.lax.broadcasted_iota(jnp.int32, r.shape, 3) == 0
            acc = jnp.where(keep, r, 0.0).sum(3)
        y = _act(acc + b_dw_ref[:][None, None, None, :], act).astype(jnp.bfloat16)

        if has_se:
            # per-image gate: mean over each image's spatial grid
            s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # (bt, Cexp)
            s = jnp.maximum(
                jnp.dot(s, w1_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
            s = jnp.dot(s, w2_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32) + b2_ref[:]
            s = jnp.clip(s + 3.0, 0.0, 6.0) / 6.0
            y = y * s[:, None, None, :].astype(jnp.bfloat16)

        oh, ow = y.shape[1], y.shape[2]
        out = jnp.dot(
            y.reshape(bt * oh * ow, -1).astype(jnp.bfloat16),
            w_proj_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) + b_proj_ref[:]
        out = out.reshape(bt, oh, ow, -1)
        if residual:
            out = out + x.astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def _pick_images_per_step(b: int, h: int, w: int, cin: int, cexp: int,
                          cout: int, stride: int = 1, itemsize: int = 2,
                          pad: int = 0) -> int:
    """Largest divisor of ``b`` (<= 16) whose VMEM working set fits and
    whose flattened sublane count bt*h*w is a multiple of 8. Fewer grid
    steps = less per-step overhead; the expanded map + fp32 stencil
    accumulator dominate the footprint.

    The budget also counts the pallas in/out DMA windows: each is
    double-buffered AND lane-padded to a multiple of 128 channels (a 16-ch
    256x256 input window allocates 8x its nominal bytes — measured compile
    OOM: 2x128MB windows for block shape (4,256,256,16) against the 128MB
    physical VMEM). Undercounting them makes the compile fail OUTSIDE this
    function's control, as an XLA OOM error instead of the ValueError ->
    XLA-fallback contract."""
    budget = 92 * 1024 * 1024  # vs the 100MB scoped cap requested below
    if w % 8 != 0:
        # Mosaic's shape cast can only collapse the spatial dims into the
        # sublane axis when the second-minor dim is sublane-aligned
        # (measured: (8,20,15,672)->(2400,672) rejected, w=32 fine)
        return 0

    def lanes(c: int) -> int:
        return -(-c // 128) * 128

    oh, ow = h // stride, w // stride
    for bt in (16, 8, 4, 2, 1):
        if b % bt != 0:
            continue
        if (bt * h * w) % 8 != 0:
            continue
        if pad:
            # scratch mode: bf16 padded scratch replaces the expanded
            # activation + per-tap shifted temp (taps are slice loads)
            bytes_needed = bt * (
                (h + 2 * pad) * (w + 2 * pad) * 2 * cexp  # padded scratch
                + h * w * (
                    2 * cexp  # expand-matmul output staged into scratch
                    + 4 * cexp  # fp32 stencil accumulator
                    + 2 * cin + 4 * cout  # input + output (in-register)
                )
            )
        else:
            bytes_needed = bt * h * w * (
                2 * cexp  # expanded bf16
                + 4 * cexp  # fp32 stencil accumulator
                + 2 * cexp  # shifted term temp
                + 2 * cin + 4 * cout  # input + output (in-register)
            )
        bytes_needed += bt * 2 * (  # double-buffered DMA windows, lane-padded
            h * w * lanes(cin) + oh * ow * lanes(cout)
        ) * itemsize
        if bytes_needed <= budget:
            return bt
    return 0  # no valid tiling (caller falls back to XLA)


def _ir_value(x, w, bt: int, h: int, wd: int, k: int, act: str,
              has_expand: bool, has_se: bool, residual: bool, dilation: int):
    """One stride-1 inverted-residual block on in-VMEM VALUES (the
    chained-megakernel body; same math as _make_kernel's concat path)."""
    if has_expand:
        y = jnp.dot(
            x.reshape(bt * h * wd, -1).astype(jnp.bfloat16),
            w["exp_k"][:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) + w["exp_b"][:]
        y = _act(y, act).reshape(bt, h, wd, -1).astype(jnp.bfloat16)
    else:
        y = x.astype(jnp.bfloat16)

    # MTG_DW_SPLIT=n splits the k^2-term stencil accumulation into n
    # channel chunks processed sequentially — the round-4 trace attributed
    # ~1.4 ms of the tail to Mosaic register-spill traffic (132 MB of
    # spill slots at bt=8 for the full-width chain); halving the live
    # value width per chain halves the per-chunk register footprint at
    # the cost of re-walking the shift pattern per chunk (shift bytes are
    # unchanged in total). Default 1 = the round-4 single-chain path.
    import os as _os

    split = int(_os.environ.get("MTG_DW_SPLIT", "1"))
    cexp = y.shape[-1]
    if split <= 1 or cexp % split != 0:
        split = 1
    cw = cexp // split
    ks = range(-(k - 1) // 2, (k - 1) // 2 + 1)
    accs = []
    for ci in range(split):
        sl = slice(ci * cw, (ci + 1) * cw)
        ysub = y[..., sl] if split > 1 else y
        acc = None
        for ix, dx in enumerate(ks):
            yc = _shift2d(ysub, 0, dx * dilation) if dx else ysub
            for iy, dy in enumerate(ks):
                xs_ = _shift2d(yc, dy * dilation, 0) if dy else yc
                term = xs_ * w["dw_k"][iy * k + ix][None, None, None, sl].astype(
                    jnp.bfloat16
                )
                acc = (term.astype(jnp.float32) if acc is None
                       else acc + term.astype(jnp.float32))
        accs.append(acc)
    acc = accs[0] if split == 1 else jnp.concatenate(accs, axis=-1)
    y = _act(acc + w["dw_b"][:][None, None, None, :], act).astype(jnp.bfloat16)

    if has_se:
        s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        s = jnp.maximum(
            jnp.dot(s, w["se1_k"][:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + w["se1_b"][:], 0.0)
        s = jnp.dot(s, w["se2_k"][:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + w["se2_b"][:]
        s = jnp.clip(s + 3.0, 0.0, 6.0) / 6.0
        y = y * s[:, None, None, :].astype(jnp.bfloat16)

    out = jnp.dot(
        y.reshape(bt * h * wd, -1).astype(jnp.bfloat16),
        w["proj_k"][:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + w["proj_b"][:]
    out = out.reshape(bt, h, wd, -1)
    if residual:
        out = out + x.astype(jnp.float32)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "act", "dilation", "interpret",
                     "images_per_step"),
)
def fused_tail_chain(
    x: jax.Array,  # (B, H, W, Cin)
    params_list: tuple,  # tuple of folded block subtrees, executed in order
    kernel_size: int = 5,
    act: str = "hardswish",
    dilation: int = 2,
    interpret: bool = False,
    images_per_step: Optional[int] = None,
) -> jax.Array:
    """Run a CHAIN of stride-1 inverted-residual blocks as ONE pallas
    kernel (the serving tail: blocks 12-14, 32x32 maps at 512^2).

    vs one pallas_call per block this removes two kernel launches, two
    double-buffered inter-block DMA window pairs, and two HBM round trips
    of the 160-ch inter-block feature maps per grid step — per-step
    overhead that the per-block A/B experiments (shift restructuring,
    accumulator dtype) showed was NOT in the arithmetic. Residual
    connections are applied where cin == cout (MobileNetV3 tail rule).
    VMEM accounting uses the widest block; raises ValueError when no
    tiling fits (callers fall back to per-block kernels).
    """
    b, h, w, cin = x.shape
    cexp_max, chain_cout = 0, cin
    cfgs = []
    for p in params_list:
        has_expand = "expand" in p
        has_se = "se" in p
        cexp = p["depthwise"]["conv"]["kernel"].shape[-1]
        cout = p["project"]["conv"]["kernel"].shape[-1]
        cfgs.append((has_expand, has_se, cexp, cout,
                     chain_cout == cout))  # residual if shapes allow
        cexp_max = max(cexp_max, cexp)
        chain_cout = cout
    # MTG_CHAIN_BT=4|2|1 sweeps images-per-grid-step below the VMEM-auto
    # choice (8 at 512^2): fewer live images shrink Mosaic's register
    # working set (the round-4 spill diagnosis) at the cost of more grid
    # steps. A/B lever only; default stays on the auto choice.
    import os as _os

    env_bt = _os.environ.get("MTG_CHAIN_BT")
    if images_per_step is None and env_bt:
        images_per_step = int(env_bt)
    bt = images_per_step or _pick_images_per_step(
        b, h, w, cin, cexp_max, chain_cout, stride=1,
        itemsize=x.dtype.itemsize,
    )
    if bt == 0 or b % bt != 0 or (bt * h * w) % 8 != 0:
        raise ValueError(f"no valid chained tiling for shape {x.shape}")

    inputs = [x]
    in_specs = [
        pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]

    def add_mat(arr):
        arr = jnp.asarray(arr, jnp.float32)
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda i: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        ))

    names_per_block = []
    for p, (has_expand, has_se, cexp, cout, _res) in zip(params_list, cfgs):
        names = []
        if has_expand:
            add_mat(p["expand"]["conv"]["kernel"].reshape(-1, cexp))
            add_mat(p["expand"]["conv"]["bias"])
            names += ["exp_k", "exp_b"]
        add_mat(p["depthwise"]["conv"]["kernel"].reshape(kernel_size**2, cexp))
        add_mat(p["depthwise"]["conv"]["bias"])
        names += ["dw_k", "dw_b"]
        if has_se:
            add_mat(p["se"]["fc1"]["kernel"].reshape(cexp, -1))
            add_mat(p["se"]["fc1"]["bias"])
            add_mat(p["se"]["fc2"]["kernel"].reshape(-1, cexp))
            add_mat(p["se"]["fc2"]["bias"])
            names += ["se1_k", "se1_b", "se2_k", "se2_b"]
        add_mat(p["project"]["conv"]["kernel"].reshape(cexp, cout))
        add_mat(p["project"]["conv"]["bias"])
        names += ["proj_k", "proj_b"]
        names_per_block.append(names)

    def kernel(*refs):
        x_ref, rest = refs[0], refs[1:]
        out_ref = rest[-1]
        rest = rest[:-1]
        val = x_ref[:]
        pos = 0
        for (has_expand, has_se, _cexp, _cout, res), names in zip(
            cfgs, names_per_block
        ):
            wdict = {nm: rest[pos + j] for j, nm in enumerate(names)}
            pos += len(names)
            val = _ir_value(val, wdict, bt, h, w, kernel_size, act,
                            has_expand, has_se, res, dilation)
        out_ref[:] = val.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, chain_cout), x.dtype),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bt, h, w, chain_cout), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "stride", "act", "residual", "dilation", "interpret",
        "images_per_step", "stencil",
    ),
)
def fused_inverted_residual(
    x: jax.Array,  # (B, H, W, Cin)
    params: dict,  # folded ConvBNAct layout: expand?/depthwise/se?/project
    kernel_size: int = 3,
    stride: int = 1,
    act: str = "relu",
    residual: bool = False,
    dilation: int = 1,
    interpret: bool = False,
    images_per_step: Optional[int] = None,
    stencil: str = "auto",
) -> jax.Array:
    """Run one folded inverted-residual block as a single fused kernel.

    ``params`` is the block subtree produced by export.fold_bn for a
    models.layers.InvertedResidual: {"expand"?: {"conv": {kernel, bias}},
    "depthwise": {...}, "se"?: {"fc1": {...}, "fc2": {...}},
    "project": {...}} (HWIO kernels).

    The grid processes ``images_per_step`` images per step (auto-chosen to
    fit VMEM and align the flattened sublane dim; see
    :func:`_pick_images_per_step`). Raises ValueError when no valid tiling
    exists — callers keep those blocks on the XLA path.
    """
    b, h, w, cin = x.shape
    has_expand = "expand" in params
    has_se = "se" in params
    cexp = params["depthwise"]["conv"]["kernel"].shape[-1]
    cout = params["project"]["conv"]["kernel"].shape[-1]
    oh, ow = h // stride, w // stride
    if stencil == "auto":
        # MTG_FUSED_STENCIL=concat|scratch overrides for on-chip A/B runs.
        # Default stays on the hardware-validated concat path until the
        # scratch path's Mosaic lowering is measured on the real chip
        # (interpret-mode correctness is already gated in tests).
        import os

        env = os.environ.get("MTG_FUSED_STENCIL")
        stencil = env if env in ("scratch", "concat") else "concat"
        if stride != 1:
            stencil = "concat"
    if stencil not in ("scratch", "concat"):
        raise ValueError(f"unknown stencil mode {stencil!r}")
    if stencil == "scratch" and stride != 1:
        raise ValueError("scratch stencil supports stride 1 only")
    pad = (kernel_size - 1) // 2 * dilation if stencil == "scratch" else 0
    bt = images_per_step or _pick_images_per_step(
        b, h, w, cin, cexp, cout, stride=stride, itemsize=x.dtype.itemsize,
        pad=pad,
    )
    if bt == 0 or b % bt != 0 or (bt * h * w) % 8 != 0:
        raise ValueError(
            f"no valid fused tiling for shape {x.shape} (bt={bt})"
        )

    inputs = [x]
    in_specs = [
        pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    ]

    def add_mat(arr):
        arr = jnp.asarray(arr, jnp.float32)
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape),
                                     memory_space=pltpu.VMEM))

    if has_expand:
        add_mat(params["expand"]["conv"]["kernel"].reshape(cin, cexp))
        add_mat(params["expand"]["conv"]["bias"])
    # depthwise HWIO (k, k, 1, Cexp) -> (k*k, Cexp)
    add_mat(params["depthwise"]["conv"]["kernel"].reshape(kernel_size**2, cexp))
    add_mat(params["depthwise"]["conv"]["bias"])
    if has_se:
        add_mat(params["se"]["fc1"]["kernel"].reshape(cexp, -1))
        add_mat(params["se"]["fc1"]["bias"])
        add_mat(params["se"]["fc2"]["kernel"].reshape(-1, cexp))
        add_mat(params["se"]["fc2"]["bias"])
    add_mat(params["project"]["conv"]["kernel"].reshape(cexp, cout))
    add_mat(params["project"]["conv"]["bias"])

    use_residual = residual and stride == 1 and cin == cout
    # MTG_DW_ACC=bfloat16 accumulates the stencil in bf16 with ONE final
    # convert (A/B lever: ~25 per-term converts + f32 adds are the largest
    # VPU cost in the tail blocks); default fp32 accumulation.
    import os as _os

    acc_dtype = _os.environ.get("MTG_DW_ACC", "float32")
    kernel = _make_kernel(bt, h, w, kernel_size, stride, act, has_expand,
                          has_se, use_residual, dilation,
                          use_scratch=(stencil == "scratch"),
                          acc_dtype=acc_dtype)
    scratch_shapes = []
    if stencil == "scratch":
        scratch_shapes.append(
            pltpu.VMEM((bt, h + 2 * pad, w + 2 * pad, cexp), jnp.bfloat16)
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cout), x.dtype),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bt, oh, ow, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch_shapes,
        # whole-image VMEM residency needs headroom beyond the default 16MB
        # scoped limit (v5e has 128MB of physical VMEM... scoped stack only);
        # raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
