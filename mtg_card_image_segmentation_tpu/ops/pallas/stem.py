"""Fused stem conv (3x3, stride 2, C=3 -> 16) as a space-to-depth matmul.

XLA executes the stem (reference ``train/model.py`` backbone entry; our
ConvBNAct stem, models/layers.py) very poorly at serving time: a 3-channel
conv leaves 125/128 MXU lanes idle and the uint8 -> centered-float input
materializes at fp32. Measured at 512x512 b128 on v5e it is 5.9 ms — 23% of
the whole forward pass for 0.3% of the FLOPs.

TPU-native reformulation: space-to-depth. With the image re-tiled so each
(8, 8) pixel cell becomes one "pixel" of 8*8*3 = 192 channels, the 3x3
stride-2 convolution over pixels becomes, per cell, a dense mix of the
cell's 192 inputs (plus a 1-cell halo up/left) into the cell's 4*4 = 16
output pixels x 16 channels = 256 outputs:

    Y4[I, J] = sum_{s in {0,-1}^2} shift(X8, s)[I, J] @ W_s

where X8 is the (H/8, W/8, 192) space-to-depth-8 image, Y4 the
(H/4, W/4, 256) space-to-depth-4 output, and the four W_s (192, 256)
matrices are scatter-assembled host-side from the (3, 3, 3, 16) conv
kernel. 192- and 256-lane operands use the MXU at full width; the halo
shifts are cheap sublane moves. uint8 -> centered-bf16 conversion, bias,
and hardswish all fuse into the same kernel, so HBM sees one uint8 read
and one bf16 write.

Serving integration (serving/predictor.py): the ImageNet normalization is
folded into the conv weights (``_fold_normalize_into_stem``) and the
centering constant ``255 * mean`` becomes the kernel's per-channel input
shift; zero padding of the *centered* image is exactly normalized-zero
padding, matching the reference conv's border behavior.

STATUS — measured on the real v5e @512x512 b128, and NOT the serving
default (opt-in via MTG_FUSED_STEM=1):

- the s2d input transpose is free (XLA folds it into a layout change) and
  the kernel's matmul time is negligible — the reformulation itself works;
- but the output must come back to NHWC, and that depth-to-space is the
  whole cost: ~27 ms standalone / +2.4 ms fused into the consumer
  (end-to-end predictor 27.2 ms vs 24.8 ms with XLA's own stem);
- folding the d2s into the kernel is not currently possible: Mosaic
  rejects both formulations ("infer-vector-layout: unsupported shape
  cast" for the rank-6 reshape and for the sublane->lane merge), see
  ``_make_kernel_folded`` (kept for interpret-mode parity and for when
  Mosaic grows these reshapes);
- XLA's conv stem wins end-to-end because its output is already NHWC and
  the layout engine schedules the C=3 conv better than its 3/128 lane
  occupancy suggests.

The kernel stays as the foundation for a future s2d-resident backbone
prefix (where no d2s would be needed until stride 8) and as the measured
record of why the serving path keeps the XLA stem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELL = 8  # input space-to-depth factor; output cells are CELL // 2
_SHIFTS = ((0, 0), (-1, 0), (0, -1), (-1, -1))


def _assemble_shift_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, 3, 16) HWIO conv kernel -> (4, 192, 256) per-shift matrices.

    Input lane (di*8 + dj)*3 + c holds pixel (8I+di, 8J+dj) channel c;
    output lane (pi*4 + pj)*16 + o holds pixel (4I+pi, 4J+pj) channel o.
    Output pixel (pi, pj) of cell (I, J) reads input row u = 2*pi + dy of
    cell I when u >= 0, else row 7 of cell I-1 (the shift) — likewise for
    columns. Indices are static; values trace (jit-compatible, the scatter
    constant-folds into the weights at compile time).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw, cin) == (3, 3, 3), kernel.shape
    half = CELL // 2
    w = jnp.zeros((len(_SHIFTS), CELL * CELL * cin, half * half * cout),
                  jnp.float32)
    sidx = {s: i for i, s in enumerate(_SHIFTS)}
    rows_c = np.arange(cin)[:, None]
    for pi in range(half):
        for dy in (-1, 0, 1):
            u = 2 * pi + dy
            si, di = (0, u) if u >= 0 else (-1, u + CELL)
            for pj in range(half):
                for dx in (-1, 0, 1):
                    v = 2 * pj + dx
                    sj, dj = (0, v) if v >= 0 else (-1, v + CELL)
                    s = sidx[(si, sj)]
                    rows = (di * CELL + dj) * cin + rows_c  # (cin, 1)
                    cols = (pi * half + pj) * cout + np.arange(cout)[None, :]
                    w = w.at[s, rows, cols].add(
                        kernel[1 + dy, 1 + dx].astype(jnp.float32)
                    )
    return w


def space_to_depth(x: jax.Array, cell: int) -> jax.Array:
    """(B, H, W, C) -> (B, H/cell, W/cell, cell*cell*C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // cell, cell, w // cell, cell, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // cell, w // cell, cell * cell * c
    )


def depth_to_space(x: jax.Array, cell: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    b, hh, ww, cc = x.shape
    c = cc // (cell * cell)
    x = x.reshape(b, hh, ww, cell, cell, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * cell, ww * cell, c)


def _shift_cells(x: jax.Array, si: int, sj: int) -> jax.Array:
    """out[b, i, j] = x[b, i+si, j+sj] with zero fill (si, sj in {0, -1})."""
    if si == -1:
        x = jnp.concatenate(
            [jnp.zeros_like(x[:, -1:]), x[:, :-1]], axis=1
        )
    if sj == -1:
        x = jnp.concatenate(
            [jnp.zeros_like(x[:, :, -1:]), x[:, :, :-1]], axis=2
        )
    return x


def _make_kernel(n_cin: int):
    def kernel(x_ref, center_ref, w_ref, b_ref, out_ref):
        # uint8 -> centered bf16 (Mosaic: uint8 casts go through int32).
        # 0..255 are exact in bf16; subtracting the bf16-rounded center
        # costs <= 0.25 vs an fp32 subtract and skips the fp32 intermediate
        # (the kernel is VMEM-limited, not accuracy-limited).
        x = x_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        x = x - center_ref[:].astype(jnp.bfloat16)  # (bt, HH, WW, 192)
        bt, hh, ww, cc = x.shape
        acc = None
        for i, (si, sj) in enumerate(_SHIFTS):
            term = jnp.dot(
                _shift_cells(x, si, sj).reshape(bt * hh * ww, cc),
                w_ref[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
        y = acc + b_ref[:]
        y = y * (jnp.clip(y + 3.0, 0.0, 6.0) / 6.0)  # hardswish
        out_ref[:] = y.reshape(out_ref.shape).astype(out_ref.dtype)

    del n_cin
    return kernel


def _make_kernel_folded(half: int, cout: int):
    """Variant that depth-to-spaces the result inside the kernel: the HBM
    output is already (bt, H/2, (W/2)*cout), so no XLA transpose follows.
    The (ww, pi) swap happens at VMEM speed on registers."""

    def kernel(x_ref, center_ref, w_ref, b_ref, out_ref):
        x = x_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        x = x - center_ref[:].astype(jnp.bfloat16)  # (bt, HH, WW, 192)
        bt, hh, ww, cc = x.shape
        acc = None
        for i, (si, sj) in enumerate(_SHIFTS):
            term = jnp.dot(
                _shift_cells(x, si, sj).reshape(bt * hh * ww, cc),
                w_ref[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
        y = acc + b_ref[:]
        y = y * (jnp.clip(y + 3.0, 0.0, 6.0) / 6.0)  # hardswish
        y = y.reshape(bt, hh, ww, half, half, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5)  # (bt, hh, pi, ww, pj, cout)
        out_ref[:] = y.reshape(out_ref.shape).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "images_per_step", "interpret", "fold_d2s"),
)
def fused_stem(
    images_u8: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    center: jax.Array,
    out_dtype=jnp.bfloat16,
    images_per_step: int = 0,
    interpret: bool = False,
    fold_d2s: bool = False,
) -> jax.Array:
    """(B, H, W, 3) uint8 -> hardswish(conv3x3_s2(u8 - center) + b).

    Exactly the serving stem (ConvBNAct(16, 3, stride=2, act="hardswish")
    with BN folded and normalization folded into the weights), returning
    (B, H/2, W/2, 16) ``out_dtype``. H and W must be multiples of 8.
    """
    b, h, w, c = images_u8.shape
    assert c == 3 and h % CELL == 0 and w % CELL == 0, images_u8.shape
    hh, ww = h // CELL, w // CELL
    n_out = (CELL // 2) ** 2 * kernel.shape[-1]

    x8 = space_to_depth(images_u8, CELL)  # (B, H/8, W/8, 192) uint8
    w_s = _assemble_shift_weights(kernel)
    center_pat = jnp.tile(jnp.asarray(center, jnp.float32), CELL * CELL)
    bias_pat = jnp.tile(
        jnp.asarray(bias, jnp.float32), (CELL // 2) ** 2
    ).reshape(1, n_out)

    bt = images_per_step
    if bt == 0:
        # VMEM-aware: the per-image working set (double-buffered u8 in,
        # centered bf16, four shifted matmul operands, fp32 accumulator,
        # double-buffered out) is ~3 KB per 8x8 cell — cap bt * cells so
        # the step stays well under the 128 MB VMEM (b128 @512x512 with
        # bt=16 measured 210 MB and failed to compile; bt=4 fits)
        cells = hh * ww
        bt = 1
        for cand in (16, 8, 4, 2, 1):
            if b % cand == 0 and cand * cells <= 18_000:
                bt = cand
                break

    half, cout = CELL // 2, kernel.shape[-1]
    in_specs = [
        pl.BlockSpec((bt, hh, ww, x8.shape[-1]), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, x8.shape[-1]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_s.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    args = (x8, center_pat.reshape(1, -1), w_s, bias_pat)

    if fold_d2s:
        # HBM output is already depth-to-spaced: (B, H/2, (W/2)*cout),
        # which reshapes (for free) to NHWC (B, H/2, W/2, cout). The XLA
        # d2s transpose this replaces measured 27 ms at b128 @512x512 (the
        # (pi, pj) lanes -> spatial move defeats XLA's layout folding);
        # in-kernel it rides VMEM bandwidth.
        out = pl.pallas_call(
            _make_kernel_folded(half, cout),
            out_shape=jax.ShapeDtypeStruct(
                (b, hh * half, ww * half * cout), out_dtype
            ),
            grid=(b // bt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bt, hh * half, ww * half * cout), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            compiler_params=params,
            interpret=interpret,
        )(*args)
        return out.reshape(b, hh * half, ww * half, cout)

    out = pl.pallas_call(
        _make_kernel(x8.shape[-1]),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, n_out), out_dtype),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bt, hh, ww, n_out), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=params,
        interpret=interpret,
    )(*args)
    # (B, H/8, W/8, 256) -> (B, H/2, W/2, 16)
    return depth_to_space(out, CELL // 2)
