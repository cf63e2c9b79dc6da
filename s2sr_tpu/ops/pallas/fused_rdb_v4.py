"""Pallas fused RDB v4 — the round-3 kernel campaign (VERDICT r2 #1).

Fresh MXU microbenchmarks (``scripts/bench_mxu.py``, v5e, differential
timing that cancels the ~33 ms relay latency) overturned the round-2
"raw matmul ceiling ≈ 52 TF/s" conclusion: with VMEM-ref operands the
same shapes run far faster —

    K=N=128 chained dots      337 TF/s
    K=N=192 (lhs from ref)    132 TF/s
    K=288→128 pair            121 TF/s
    K=96→160 / 96→128 pairs    88 / 57 TF/s

so v2's 34.7 TF/s was kernel structure, not hardware: narrow SSA
accumulators (32/96/160-lane f32 values → padded layouts on every VPU
op), unconditional per-stage masks, and interleaved staging. v4 keeps
v2's winning ideas (delta formulation, dx staged in lanes → K=3C, dy
as free sublane slices, double-buffered input DMA) and fixes the rest:

- the future-stage accumulator lives in ONE f32 VMEM ref with the
  prefix layout ``[a5|a4|a3|a2|a1]`` (the same trick that took the XLA
  path 43.7→46.0): every stage's contribution add is a lane-0-aligned
  prefix slice of a 128-tile-aligned buffer, never a narrow SSA value;
- image-border masks run ONLY on tiles that touch the border
  (``@pl.when`` on both store paths) — interior tiles pay zero mask
  VPU work; halo garbage needs no mask (PAD=8 ≥ 5-stage shrink, the
  crop discards it);
- f32 accumulation end-to-end (better numerics than the bf16-add XLA
  path; the fp32 exactness gate in ``scripts/bench_kernels.py`` covers
  correctness);
- knobs for the remaining shape question (``stage_taps``: 3-tap
  staging K=96 vs 9-tap K=288 for the growth convs) so the winner is
  measured, not guessed.

Weight layouts come from :func:`pack_rdb_weights_v2` /
:func:`pack_rdb_weights_v3` in ``fused_rdb.py`` (unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NF = 64
G = 32
PAD = 8


def _cdiv(a, b):
    return -(-a // b)


def _fill3(b3_ref, v, cin, rows=None):
    """[shift(v,+1 along W) | v | shift(v,−1)] into lane groups."""
    sw = v.shape[1]
    b3_ref[:, :, 0:cin] = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :sw, :]
    b3_ref[:, :, cin:2 * cin] = v
    b3_ref[:, :, 2 * cin:3 * cin] = jnp.pad(
        v, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]


def _fill9(b9_ref, v, cin, oh):
    """All nine (dy, dx) shifts staged to output-row alignment."""
    sw = v.shape[1]
    left = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :sw, :]
    right = jnp.pad(v, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
    for dy in range(3):
        b9_ref[0:oh, :, (dy * 3 + 0) * cin:(dy * 3 + 1) * cin] = left[dy:dy + oh]
        b9_ref[0:oh, :, (dy * 3 + 1) * cin:(dy * 3 + 2) * cin] = v[dy:dy + oh]
        b9_ref[0:oh, :, (dy * 3 + 2) * cin:(dy * 3 + 3) * cin] = right[dy:dy + oh]


def _conv3(b3_ref, oh, kernel3, nout, k3):
    """3×3 conv = 3 dy-sliced (M, 3C)×(3C, N) dots, f32 accumulate."""
    sw = b3_ref.shape[1]
    acc = None
    for dy in range(3):
        flat = b3_ref[dy:dy + oh, :, 0:k3].reshape(oh * sw, k3)
        part = jax.lax.dot_general(
            flat, kernel3[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc.reshape(oh, sw, nout)


def _conv9(b9_ref, oh, kernel9, nout, k9):
    sw = b9_ref.shape[1]
    flat = b9_ref[0:oh, :, 0:k9].reshape(oh * sw, k9)
    return jax.lax.dot_general(
        flat, kernel9[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(oh, sw, nout)


def _kernel_v4(hparams, x_hbm, wx, w1, w2, w3, w4, b14, b5,
               out_ref, in_a, in_b, b3, acc, sems):
    img_h, img_w, tile, stage_taps, prefetch, ablate = hparams
    b, ty, tx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nty, ntx = pl.num_programs(1), pl.num_programs(2)
    sw = tile + 2 * PAD
    oh = sw - 2
    dtype = in_a.dtype
    step = (b * nty + ty) * ntx + tx
    total = pl.num_programs(0) * nty * ntx

    def dma(buf, sem_idx, bb, tyy, txx):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(tyy * tile, sw), pl.ds(txx * tile, sw), :],
            buf, sems.at[sem_idx])

    if not prefetch:
        # serial DMA: no cross-step semaphore protocol (debug knob)
        d = dma(in_a, 0, b, ty, tx)
        d.start()
        d.wait()
        src = in_a[:, :, :NF]
    else:
        slot = step % 2

        @pl.when(step == 0)
        def _():
            dma(in_a, 0, b, ty, tx).start()

        nstep = step + 1
        tx2 = nstep % ntx
        ty2 = (nstep // ntx) % nty
        b2 = nstep // (ntx * nty)

        @pl.when((nstep < total) & (nstep % 2 == 0))
        def _():
            dma(in_a, 0, b2, ty2, tx2).start()

        @pl.when((nstep < total) & (nstep % 2 == 1))
        def _():
            dma(in_b, 1, b2, ty2, tx2).start()

        @pl.when(slot == 0)
        def _():
            dma(in_a, 0, b, ty, tx).wait()

        @pl.when(slot == 1)
        def _():
            dma(in_b, 1, b, ty, tx).wait()

        src = jnp.where(slot == 0, in_a[:, :, :NF], in_b[:, :, :NF])

    # border detection: the window [ty·tile, ty·tile+sw) maps to image
    # rows [.. - PAD, ..) in image coords; interior iff the whole
    # window (incl. halo) lies inside the image.
    base_y = ty * tile
    base_x = tx * tile
    is_border = ((base_y < PAD) | (base_x < PAD)
                 | (base_y + sw > img_h + PAD)
                 | (base_x + sw > img_w + PAD))

    bias = b14[0]

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    def img_mask(k):
        """Rows/cols ≥ k px inside the true image (f32 0/1), full sw."""
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0) + base_y
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1) + base_x
        ok = ((row_ids >= PAD) & (row_ids < PAD + img_h)
              & (col_ids >= PAD) & (col_ids < PAD + img_w))
        return ok

    # ---- stage 1: x's contributions → acc [a5|a4|a3|a2|a1] -----------
    _fill3(b3, src, NF)
    acc[0:oh, :, 0:192] = _conv3(b3, oh, wx, 192, 3 * NF)

    # ---- stages 2..5 ---------------------------------------------------
    # live prefix widths after each consume: 160, 128, 96, 64
    stage_ws = (w1, w2, w3, w4)
    for k in range(1, 5):
        live = 192 - (k - 1) * G          # width before consuming xk
        tail0 = live - G
        xk = lrelu(acc[0:oh, :, tail0:live] + bias[(k - 1) * G:k * G])
        xk = xk.astype(dtype)

        # image-border zeroing only on border tiles (both store paths
        # write the b3 staging; exactly one executes)
        xk_rows = jnp.pad(xk, ((1, 1), (0, 0), (0, 0)))

        if ablate != "no_fill":   # time-attribution knob: staging copies
            @pl.when(is_border)
            def _(k=k, xk_rows=xk_rows):
                m = img_mask(0)[:, :, :]
                masked = jnp.where(m, xk_rows, 0)
                if stage_taps == 3:
                    _fill3(b3, masked, G)
                else:
                    _fill9(b3, masked, G, oh)

            @pl.when(jnp.logical_not(is_border))
            def _(xk_rows=xk_rows):
                if stage_taps == 3:
                    _fill3(b3, xk_rows, G)
                else:
                    _fill9(b3, xk_rows, G, oh)

        w = stage_ws[k - 1]
        nout = live - G if k < 4 else NF
        if stage_taps == 3:
            contrib = _conv3(b3, oh, w, nout, 3 * G)
        else:
            contrib = _conv9(b3, oh, w, nout, 9 * G)
        if ablate == "no_acc":    # time-attribution knob: acc read+add
            acc[0:oh, :, 0:nout] = contrib
        else:
            acc[0:oh, :, 0:nout] = acc[0:oh, :, 0:nout] + contrib

    # ---- output --------------------------------------------------------
    y5 = acc[PAD - 1:PAD - 1 + tile, PAD:PAD + tile, 0:NF] + b5[0]
    res = src[PAD:PAD + tile, PAD:PAD + tile, :].astype(jnp.float32)
    out = (y5 * 0.2 + res)

    @pl.when(is_border)
    def _():
        m = img_mask(0)[PAD:PAD + tile, PAD:PAD + tile]
        out_ref[0] = jnp.where(m, out, 0).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_border))
    def _():
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "stage_taps",
                                    "prefetch", "ablate"))
def rdb_pallas_v4(x: jnp.ndarray, packed, b14, b5, *, interpret=False,
                  tile=144, stage_taps=3, prefetch=True, ablate=None):
    """One fused delta-form RDB, v4 structure. (B, H, W, 64) → same.

    ``packed`` is ``pack_rdb_weights_v2(...)`` output for
    ``stage_taps=3`` or ``pack_rdb_weights_v3`` for 9 — with the wx
    entry always in v2 (per-dy) layout.

    ``ablate`` (time-attribution ONLY — breaks the math): ``"no_fill"``
    skips the stage-2..5 staging copies; ``"no_acc"`` replaces the
    accumulator read+add with a plain store. Used by
    ``scripts/bench_kernels.py`` to decompose where the kernel's time
    goes (BENCH_NOTES r3).
    """
    bsz, h, w, _ = x.shape
    nty, ntx = _cdiv(h, tile), _cdiv(w, tile)
    hp, wp = nty * tile, ntx * tile
    xp = jnp.pad(x, ((0, 0), (PAD, hp - h + PAD), (PAD, wp - w + PAD),
                     (0, 4 * G - NF)))
    wx, w1, w2, w3, w4 = packed
    sw = tile + 2 * PAD
    oh = sw - 2
    stage_lanes = 3 * NF if stage_taps == 3 else 9 * G

    kernel = functools.partial(_kernel_v4,
                               (h, w, tile, stage_taps, prefetch, ablate))
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (1, tile, tile, NF), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp, NF), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),            # in_a
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),            # in_b
            pltpu.VMEM((sw, sw, max(3 * NF, stage_lanes)), x.dtype),  # b3
            pltpu.VMEM((sw, sw, 192), jnp.float32),          # acc (prefix)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wx, w1, w2, w3, w4, b14, b5)
    return out[:, :h, :w, :]
