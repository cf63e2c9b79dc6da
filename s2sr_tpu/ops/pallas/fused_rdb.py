"""Pallas TPU kernel: fully-fused Residual Dense Block.

The RDB is the hot loop of Real-ESRGAN inference (69 invocations per
forward pass of the 23-block model — SURVEY §3.1 "THE hot loop"). The
XLA path (s2sr_tpu/models/rrdbnet.py) reaches ~37 TF/s on v5e because
every one of the five convs round-trips its activations through HBM and
the 32-channel growth tensors waste MXU lanes and memory tiles.

This kernel computes one entire RDB per VMEM residency:

- the image is processed in T×T tiles with a 5-px halo (one px per
  conv); each tile's input window is DMA'd into VMEM once and all five
  convs + LeakyReLUs + the dense-sum chain run without touching HBM,
- the four 32-channel growth activations live stacked in the lanes of
  one (T+10, T+10, 128) VMEM buffer (``g``), so no 32-lane tiles exist
  anywhere: stage k's convolution contracts the full 128 lanes against
  a kernel whose not-yet-written lane rows are zero (zero activations
  contribute zero — identical math, full-width MXU contractions),
- convs are 9 shifted (sublane-rolled) full-width matmuls accumulating
  in fp32,
- image-border semantics of SAME/zero padding are preserved by masking
  every stage's activation (and the final output) to the true image
  rectangle, so results equal the unfused reference computation.

Weight packing (host side, from the standard RDB param tree):
    wx  (3,3,64,192): [K1ₓ|K2ₓ|K3ₓ|K4ₓ|K5ₓ]      — x contributions
    wg2 (3,3,128,32): rows 0:32  = K2's x1 slice   — rest zero
    wg3 (3,3,128,32): rows 0:64  = K3's x1,x2 slices
    wg4 (3,3,128,32): rows 0:96  = K4's x1..x3 slices
    wg5 (3,3,128,64): rows 0:128 = K5's x1..x4 slices
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

TILE = 64          # output tile edge (tunable; VMEM-bound)
HALO = 5           # conv validity shrink per stage
PAD = 8            # read-window margin (8-aligned HBM DMA slices)
NF = 64            # num_feat
G = 32             # growth channels


def pack_rdb_weights(p: Params, dtype=jnp.bfloat16):
    """RDB param tree → packed kernel weights (see module docstring)."""
    def sl(k, lo, hi):
        return p[f"conv{k}"]["kernel"][:, :, lo:hi, :]

    wx = jnp.concatenate([sl(k, 0, NF) for k in (1, 2, 3, 4, 5)], axis=-1)
    # input is carried at 128 lanes (zero-padded 64→128) so HBM DMA
    # slices are lane-tile aligned; extend wx with matching zero rows
    wx = jnp.concatenate(
        [wx, jnp.zeros(wx.shape[:2] + (4 * G - NF, wx.shape[3]), wx.dtype)],
        axis=2)

    def gk(k, n_src):
        """(3,3,128,Cout): rows for x1..x_{n_src}, zero rows above."""
        parts = [sl(k, NF + i * G, NF + (i + 1) * G) for i in range(n_src)]
        used = jnp.concatenate(parts, axis=2)
        pad_rows = 4 * G - n_src * G
        if pad_rows:
            used = jnp.concatenate(
                [used, jnp.zeros(used.shape[:2] + (pad_rows, used.shape[3]),
                                 used.dtype)], axis=2)
        return used

    wg2, wg3, wg4 = gk(2, 1), gk(3, 2), gk(4, 3)
    wg5 = gk(5, 4)
    biases = jnp.concatenate([p[f"conv{k}"]["bias"] for k in (1, 2, 3, 4)])
    b5 = p["conv5"]["bias"]
    def flatten_taps(w):
        # (3, 3, Cin, Cout) → (3, 3·Cin, Cout): kernel rows ordered to
        # match the b3 lane layout [shift+1 (dx0) | src (dx1) | shift−1 (dx2)]
        return w.reshape(w.shape[0], 3 * w.shape[2], w.shape[3])

    cast = lambda a: flatten_taps(a).astype(dtype)
    return (tuple(map(cast, (wx, wg2, wg3, wg4, wg5))),
            biases.astype(jnp.float32)[None, :],
            b5.astype(jnp.float32)[None, :])


def _fill_b3(src_ref, b3_ref):
    """b3 = [shift(src,+1) | src | shift(src,−1)] along lanes.

    One 3×-wide staging copy per conv lets each kernel row contract
    K = 3·Cin in a single MXU pass (3 matmuls per conv instead of 9
    narrow ones + 9 shifted temporaries). The vacated edge columns are
    zero — they reach only output columns the stage masks discard.
    """
    sw = src_ref.shape[1]
    cin = src_ref.shape[2]
    src = src_ref[:]
    b3_ref[:, :, 0:cin] = jnp.pad(
        src, ((0, 0), (1, 0), (0, 0)))[:, :sw, :]
    b3_ref[:, :, cin:2 * cin] = src
    b3_ref[:, :, 2 * cin:3 * cin] = jnp.pad(
        src, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]


def _conv_chunks(b3_ref, y0, oh, kernel3, cout, emit, chunk=64):
    """3×3 conv over full-width rows [y0-1, y0-1+oh+2) of the staged
    ``b3`` buffer (see :func:`_fill_b3`), streamed in output-channel
    chunks to bound the f32 accumulator. ``kernel3``: (3, 3·Cin, Cout)
    — tap columns pre-flattened at pack time."""
    sw = b3_ref.shape[1]
    k3 = b3_ref.shape[2]
    for c0 in range(0, cout, chunk):
        cc = min(chunk, cout - c0)
        acc = jnp.zeros((oh, sw, cc), jnp.float32)
        for dy in range(3):
            rows = b3_ref[y0 - 1 + dy:y0 - 1 + dy + oh]    # (oh, Sw, 3Cin)
            flat = rows.reshape(oh * sw, k3)
            part = jax.lax.dot_general(
                flat, kernel3[dy, :, c0:c0 + cc],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + part.reshape(oh, sw, cc)
        emit(c0, acc)


def _rdb_kernel(hparams, x_hbm, wx, wg2, wg3, wg4, wg5, b14, b5,
                out_ref, in_vmem, g_buf, px_buf, x5acc, b3, sem):
    """One T×T tile of the fused RDB. See module docstring."""
    img_h, img_w, tile = hparams
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    b = pl.program_id(0)
    sw = tile + 2 * PAD
    dtype = in_vmem.dtype

    # ---- fetch input window (halo included) --------------------------
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ty * tile, sw), pl.ds(tx * tile, sw), :],
        in_vmem, sem)
    dma.start()
    dma.wait()

    # padded-coordinate frame: image occupies [HALO, HALO+img_h).
    # masks built rank-3 directly — Mosaic cannot insert a minor dim on
    # non-32-bit (i1) vectors.
    base_y = ty * tile
    base_x = tx * tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0) + base_y
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1) + base_x
    img_mask = ((row_ids >= PAD) & (row_ids < PAD + img_h)
                & (col_ids >= PAD) & (col_ids < PAD + img_w))
    local_y = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0)
    local_x = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1)

    def stage_mask(k):
        """validity of stage-k activations: k px inside the tile window
        AND inside the true image rectangle."""
        tile_ok = ((local_y >= k) & (local_y < sw - k)
                   & (local_x >= k) & (local_x < sw - k))
        return tile_ok & img_mask

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    # ---- stage 1: p-parts of all five convs --------------------------
    oh = sw - 2
    bias14 = b14[0]

    def emit_px(c0, acc):
        if c0 < 4 * G:                                   # p1..p4 → px_buf
            px_buf[1:1 + oh, :, c0:c0 + acc.shape[2]] = acc.astype(dtype)
        else:                                            # p5 → x5 accumulator
            x5acc[1:1 + oh] = acc

    _fill_b3(in_vmem, b3)
    _conv_chunks(b3, 1, oh, wx[:], 4 * G + NF, emit_px)

    # zero g so unwritten lane groups contribute nothing
    g_buf[:] = jnp.zeros_like(g_buf)

    x1 = lrelu(px_buf[1:1 + oh, :, 0:G].astype(jnp.float32) + bias14[0:G])
    g_buf[1:1 + oh, :, 0:G] = jnp.where(
        stage_mask(1)[1:1 + oh], x1, 0.0).astype(dtype)

    # ---- stages 2..4: g-buffer convs ---------------------------------
    for k, wg in ((2, wg2), (3, wg3), (4, wg4)):
        def emit_xk(c0, acc, k=k):
            pk = px_buf[1:1 + oh, :, (k - 1) * G:k * G].astype(jnp.float32)
            xk = lrelu(pk + acc + bias14[(k - 1) * G:k * G])
            g_buf[1:1 + oh, :, (k - 1) * G:k * G] = jnp.where(
                stage_mask(k)[1:1 + oh], xk, 0.0).astype(dtype)

        _fill_b3(g_buf, b3)
        _conv_chunks(b3, 1, oh, wg[:], G, emit_xk)

    # ---- stage 5 ------------------------------------------------------
    def emit_y5(c0, acc):
        x5acc[1:1 + oh] = x5acc[1:1 + oh] + acc

    _fill_b3(g_buf, b3)
    _conv_chunks(b3, 1, oh, wg5[:], NF, emit_y5)
    x5 = x5acc[1:1 + oh] + b5[0]
    out_full = x5 * 0.2 + in_vmem[1:1 + oh, :, :NF].astype(jnp.float32)
    out_full = jnp.where(stage_mask(HALO)[1:1 + oh], out_full, 0.0)
    # interior crop: output tile covers padded rows/cols [PAD, PAD+T)
    out_ref[0] = out_full[PAD - 1:PAD - 1 + tile,
                          PAD:PAD + tile, :].astype(out_ref.dtype)


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rdb_pallas(x: jnp.ndarray, packed, b14, b5, *, interpret=False):
    """Apply one fused RDB to (B, H, W, 64) bf16. Returns same shape."""
    bsz, h, w, _ = x.shape
    tile = TILE
    nty, ntx = _cdiv(h, tile), _cdiv(w, tile)
    hp, wp = nty * tile, ntx * tile
    xp = jnp.pad(x, ((0, 0), (PAD, hp - h + PAD),
                     (PAD, wp - w + PAD), (0, 4 * G - NF)))
    wx, wg2, wg3, wg4, wg5 = packed
    sw = tile + 2 * PAD

    kernel = functools.partial(_rdb_kernel, (h, w, tile))
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # x (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # wx
            pl.BlockSpec(memory_space=pltpu.VMEM),          # wg2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # wg3
            pl.BlockSpec(memory_space=pltpu.VMEM),          # wg4
            pl.BlockSpec(memory_space=pltpu.VMEM),          # wg5
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b14
            pl.BlockSpec(memory_space=pltpu.VMEM),          # b5
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile, NF), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp, NF), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),           # in_vmem (128 lanes)
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),           # g_buf
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),           # px_buf
            pltpu.VMEM((sw, sw, NF), jnp.float32),          # x5acc
            pltpu.VMEM((sw, sw, 3 * 4 * G), x.dtype),       # b3 staging
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wx, wg2, wg3, wg4, wg5, b14, b5)
    return out[:, :h, :w, :]


# ======================================================================
# v2: delta-formulation fused RDB (round-2 rework)
#
# Round-1 measurements (BENCH_NOTES r1) showed the v1 kernel loses to
# its own arithmetic: output chunks of 64 leave half the MXU columns
# idle, the K-packed 128-lane g-buffer contracts 1.7x zero rows on
# average, TILE=64 pays a 1.56x spatial halo, and the input DMA is
# synchronous. v2 keeps the VMEM-residency idea but:
#
# - uses the *delta* formulation (models/rrdbnet.py::_rdb): each stage
#   conv emits its contributions to ALL later stages at once, so matmul
#   N widths are 192/160/128/96/64 instead of 32 — and K is compact
#   (3·64 for the input conv, 3·32 for stages; no zero rows),
# - px lane layout [p5|p4|p3|p2|p1] so every stage's accumulation
#   `px[:, :, :N] += contribution` starts at lane 0,
# - TILE=128 (halo overhead 1.27x vs 1.56x),
# - the input window DMA for grid step i+1 is issued before step i's
#   compute (double-buffered, 2 semaphores); output stays grid-blocked
#   so Pallas pipelines the writeback.
# ======================================================================


TILE_V2 = 128


def pack_rdb_weights_v2(p: Params, dtype=jnp.bfloat16):
    """RDB param tree → delta-form packed weights (v2 kernel).

    Returns (wx, w1, w2, w3, w4, b14, b5):
      wx (3, 3·64, 192): x's contributions, N-order [p5|p4|p3|p2|p1]
      w1 (3, 3·32, 160): x1's contributions [q5|q4|q3|q2]
      w2 (3, 3·32, 128): [r5|r4|r3]
      w3 (3, 3·32,  96): [s5|s4]
      w4 (3, 3·32,  64): [t5]
      b14 (1, 128): stage biases [b1|b2|b3|b4], b5 (1, 64)

    Unlike v1's K-packed layout there are NO zero kernel rows: every
    matmul contracts only real activations, and output widths are
    192/160/128/96/64 instead of 32 — full MXU columns.
    """
    def sl(k, lo, hi):
        return p[f"conv{k}"]["kernel"][:, :, lo:hi, :]

    def pack(src_lo, src_hi, ks):
        return jnp.concatenate([sl(k, src_lo, src_hi) for k in ks], axis=-1)

    wx = pack(0, NF, (5, 4, 3, 2, 1))
    w1 = pack(NF, NF + G, (5, 4, 3, 2))
    w2 = pack(NF + G, NF + 2 * G, (5, 4, 3))
    w3 = pack(NF + 2 * G, NF + 3 * G, (5, 4))
    w4 = sl(5, NF + 3 * G, NF + 4 * G)
    b14 = jnp.concatenate([p[f"conv{k}"]["bias"] for k in (1, 2, 3, 4)])
    b5 = p["conv5"]["bias"]

    def flat(w):
        return w.reshape(w.shape[0], 3 * w.shape[2], w.shape[3]).astype(dtype)

    return (tuple(flat(w) for w in (wx, w1, w2, w3, w4)),
            b14.astype(jnp.float32)[None, :],
            b5.astype(jnp.float32)[None, :])


def _fill3_ref(b3_ref, v, cin):
    """Stage [shift(v,+1 along W) | v | shift(v,−1)] into a ref's lane
    groups (ref writes at 64/32-lane granularity — the staging pattern
    the v1 kernel proved compiles on real hardware; value-level lane
    concats do NOT: Mosaic rejects offset-mismatched tpu.concatenate)."""
    sw = v.shape[1]
    b3_ref[:, :, 0:cin] = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :sw, :]
    b3_ref[:, :, cin:2 * cin] = v
    b3_ref[:, :, 2 * cin:3 * cin] = jnp.pad(
        v, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]


def _conv3_staged(b3_ref, oh, kernel3, nout, k3):
    """3×3 conv: 3 row-shifted full-width matmuls over the staged ref."""
    sw = b3_ref.shape[1]
    acc = None
    for dy in range(3):
        flat = b3_ref[dy:dy + oh, :, 0:k3].reshape(oh * sw, k3)
        part = jax.lax.dot_general(
            flat, kernel3[dy],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(oh, sw, nout)
        acc = part if acc is None else acc + part
    return acc


def _rdb_kernel_v2(hparams, x_hbm, wx, w1, w2, w3, w4, b14, b5,
                   out_ref, in_a, in_b, b3, sems):
    """Delta-form fused RDB, one T×T tile per grid step.

    Input windows are double-buffered 3-D refs (a 4-D slotted buffer is
    rejected by Mosaic: lane extents of sliced memrefs must be
    128-aligned): grid step i+1's HBM→VMEM DMA is issued before step
    i's compute, into the opposite buffer. Tap staging uses ref writes
    (v1-proven); stage accumulators are SSA values.
    """
    img_h, img_w, tile = hparams
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

    # validity masks (rank-3: Mosaic cannot minor-insert on i1 vectors)
    base_y = ty * tile
    base_x = tx * tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0) + base_y
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1) + base_x
    img_mask = ((row_ids >= PAD) & (row_ids < PAD + img_h)
                & (col_ids >= PAD) & (col_ids < PAD + img_w))
    local_y = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0)
    local_x = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1)

    def stage_mask(k):
        tile_ok = ((local_y >= k) & (local_y < sw - k)
                   & (local_x >= k) & (local_x < sw - k))
        return (tile_ok & img_mask)[1:1 + oh]

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    bias = b14[0]

    # stage 1: x's contributions to all five convs (N=192, K=3·64)
    _fill3_ref(b3, src, NF)
    px = _conv3_staged(b3, oh, wx[:], 192, 3 * NF).astype(dtype)
    # lane layout [p5(64)|p4|p3|p2|p1] — split into per-stage slots
    c5 = px[:, :, 0:NF]
    c4 = px[:, :, NF:NF + G]
    c3 = px[:, :, NF + G:NF + 2 * G]
    c2 = px[:, :, NF + 2 * G:NF + 3 * G]
    c1 = px[:, :, NF + 3 * G:]

    def stage(acc_prev, w, boff, k, nout):
        """xk from its fully-accumulated input slot; conv its
        contributions. Output cast to the compute dtype at conv exit —
        the same rounding point as the XLA path's bf16 conv outputs.
        Staging reuses the first 3·G lanes of the (now free) stage-1
        buffer — VMEM headroom for tile=144."""
        xk = lrelu(acc_prev.astype(jnp.float32) + bias[boff:boff + G])
        xk = jnp.where(stage_mask(k), xk, 0.0).astype(dtype)
        xk_full = jnp.pad(xk, ((1, 1), (0, 0), (0, 0)))    # halo rows zero
        _fill3_ref(b3, xk_full, G)
        return _conv3_staged(b3, oh, w[:], nout, 3 * G).astype(dtype)

    # eager accumulation: fold each stage's contributions into the
    # remaining slots immediately so only ≤160 live lanes persist
    q = stage(c1, w1, 0, 1, 160)                           # [q5|q4|q3|q2]
    c5 = c5 + q[:, :, 0:NF]
    c4 = c4 + q[:, :, NF:NF + G]
    c3 = c3 + q[:, :, NF + G:NF + 2 * G]
    c2 = c2 + q[:, :, NF + 2 * G:]
    r = stage(c2, w2, G, 2, 128)                           # [r5|r4|r3]
    c5 = c5 + r[:, :, 0:NF]
    c4 = c4 + r[:, :, NF:NF + G]
    c3 = c3 + r[:, :, NF + G:]
    s = stage(c3, w3, 2 * G, 3, 96)                        # [s5|s4]
    c5 = c5 + s[:, :, 0:NF]
    c4 = c4 + s[:, :, NF:]
    t = stage(c4, w4, 3 * G, 4, 64)                        # [t5]
    x5 = c5 + t

    # output crop [PAD, PAD+tile): px rows are window rows 1..sw-2
    y5 = x5[PAD - 1:PAD - 1 + tile, PAD:PAD + tile].astype(jnp.float32) \
        + b5[0]
    res = src[PAD:PAD + tile, PAD:PAD + tile, :].astype(jnp.float32)
    out_ref[0] = (y5 * 0.2 + res).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def rdb_pallas_v2(x: jnp.ndarray, packed, b14, b5, *, interpret=False,
                  tile=TILE_V2):
    """Apply one fused delta-form RDB to (B, H, W, 64). Same shape out."""
    bsz, h, w, _ = x.shape
    nty, ntx = _cdiv(h, tile), _cdiv(w, tile)
    hp, wp = nty * tile, ntx * tile
    # channels padded to 128: HBM DMA lane extents must be 128-aligned
    xp = jnp.pad(x, ((0, 0), (PAD, hp - h + PAD), (PAD, wp - w + PAD),
                     (0, 4 * G - NF)))
    wx, w1, w2, w3, w4 = packed
    sw = tile + 2 * PAD

    kernel = functools.partial(_rdb_kernel_v2, (h, w, tile))
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
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),          # in_a
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),          # in_b
            pltpu.VMEM((sw, sw, 3 * NF), x.dtype),         # b3 (shared staging)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wx, w1, w2, w3, w4, b14, b5)
    return out[:, :h, :w, :]


# ======================================================================
# v3: 9-tap staged delta RDB — one matmul per conv.
#
# v2 profiling arithmetic (BENCH_NOTES r2): at tile=128 the kernel
# reaches ~52 TF/s of raw matmul work while the MXU shape ceiling is
# ~219 TF/s — the gap is VPU/VMEM traffic, dominated by the two f32
# inter-dy accumulation adds per conv (~104 MB/tile). v3 stages all
# NINE taps in lanes (K = 9·Cin) so each conv is ONE dot_general with
# no partial-sum adds; kernel rows are the flattened (dy, dx, Cin) taps.
# ======================================================================


def pack_rdb_weights_v3(p: Params, dtype=jnp.bfloat16):
    """Like :func:`pack_rdb_weights_v2` but kernels flattened to
    (9·Cin, Cout) with rows ordered (dy, dx, cin) to match the 9-tap
    lane staging."""
    def sl(k, lo, hi):
        return p[f"conv{k}"]["kernel"][:, :, lo:hi, :]

    def pack(src_lo, src_hi, ks):
        return jnp.concatenate([sl(k, src_lo, src_hi) for k in ks], axis=-1)

    wx = pack(0, NF, (5, 4, 3, 2, 1))
    w1 = pack(NF, NF + G, (5, 4, 3, 2))
    w2 = pack(NF + G, NF + 2 * G, (5, 4, 3))
    w3 = pack(NF + 2 * G, NF + 3 * G, (5, 4))
    w4 = sl(5, NF + 3 * G, NF + 4 * G)
    b14 = jnp.concatenate([p[f"conv{k}"]["bias"] for k in (1, 2, 3, 4)])
    b5 = p["conv5"]["bias"]

    def flat9(w):
        return w.reshape(9 * w.shape[2], w.shape[3]).astype(dtype)

    return (tuple(flat9(w) for w in (wx, w1, w2, w3, w4)),
            b14.astype(jnp.float32)[None, :],
            b5.astype(jnp.float32)[None, :])


def _fill9_ref(b9_ref, v, cin, oh):
    """Stage all nine (dy, dx) shifted copies of ``v`` into lane groups
    of ``b9_ref`` rows [0, oh): group g = dy*3+dx holds
    v[y+dy-1, x+dx-1] aligned to output row y (window row y+1)."""
    sw = v.shape[1]
    left = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :sw, :]
    right = jnp.pad(v, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
    for dy in range(3):
        rows_l = left[dy:dy + oh]
        rows_c = v[dy:dy + oh]
        rows_r = right[dy:dy + oh]
        b9_ref[0:oh, :, (dy * 3 + 0) * cin:(dy * 3 + 1) * cin] = rows_l
        b9_ref[0:oh, :, (dy * 3 + 1) * cin:(dy * 3 + 2) * cin] = rows_c
        b9_ref[0:oh, :, (dy * 3 + 2) * cin:(dy * 3 + 3) * cin] = rows_r


def _conv9_staged(b9_ref, oh, kernel9, nout, k9):
    """One-shot 3×3 conv: a single (oh·sw, 9C) × (9C, N) matmul."""
    sw = b9_ref.shape[1]
    flat = b9_ref[0:oh, :, 0:k9].reshape(oh * sw, k9)
    return jax.lax.dot_general(
        flat, kernel9,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(oh, sw, nout)


def _rdb_kernel_v3(hparams, x_hbm, wx, w1, w2, w3, w4, b14, b5,
                   out_ref, in_a, in_b, b9, sems):
    img_h, img_w, tile = hparams
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

    base_y = ty * tile
    base_x = tx * tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0) + base_y
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1) + base_x
    img_mask = ((row_ids >= PAD) & (row_ids < PAD + img_h)
                & (col_ids >= PAD) & (col_ids < PAD + img_w))
    local_y = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 0)
    local_x = jax.lax.broadcasted_iota(jnp.int32, (sw, sw, 1), 1)

    def stage_mask(k):
        tile_ok = ((local_y >= k) & (local_y < sw - k)
                   & (local_x >= k) & (local_x < sw - k))
        return (tile_ok & img_mask)[1:1 + oh]

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    bias = b14[0]

    _fill9_ref(b9, src, NF, oh)
    px = _conv9_staged(b9, oh, wx[:], 192, 9 * NF).astype(dtype)
    c5 = px[:, :, 0:NF]
    c4 = px[:, :, NF:NF + G]
    c3 = px[:, :, NF + G:NF + 2 * G]
    c2 = px[:, :, NF + 2 * G:NF + 3 * G]
    c1 = px[:, :, NF + 3 * G:]

    def stage(acc_prev, w, boff, k, nout):
        xk = lrelu(acc_prev.astype(jnp.float32) + bias[boff:boff + G])
        xk = jnp.where(stage_mask(k), xk, 0.0).astype(dtype)
        xk_full = jnp.pad(xk, ((1, 1), (0, 0), (0, 0)))
        _fill9_ref(b9, xk_full, G, oh)      # staging aliases the b9 prefix
        return _conv9_staged(b9, oh, w[:], nout, 9 * G).astype(dtype)

    q = stage(c1, w1, 0, 1, 160)
    c5 = c5 + q[:, :, 0:NF]
    c4 = c4 + q[:, :, NF:NF + G]
    c3 = c3 + q[:, :, NF + G:NF + 2 * G]
    c2 = c2 + q[:, :, NF + 2 * G:]
    r = stage(c2, w2, G, 2, 128)
    c5 = c5 + r[:, :, 0:NF]
    c4 = c4 + r[:, :, NF:NF + G]
    c3 = c3 + r[:, :, NF + G:]
    s = stage(c3, w3, 2 * G, 3, 96)
    c5 = c5 + s[:, :, 0:NF]
    c4 = c4 + s[:, :, NF:]
    t = stage(c4, w4, 3 * G, 4, 64)
    x5 = c5 + t

    y5 = x5[PAD - 1:PAD - 1 + tile, PAD:PAD + tile].astype(jnp.float32) \
        + b5[0]
    res = src[PAD:PAD + tile, PAD:PAD + tile, :].astype(jnp.float32)
    out_ref[0] = (y5 * 0.2 + res).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def rdb_pallas_v3(x: jnp.ndarray, packed, b14, b5, *, interpret=False,
                  tile=TILE_V2):
    """Apply one fused 9-tap-staged delta RDB to (B, H, W, 64)."""
    bsz, h, w, _ = x.shape
    nty, ntx = _cdiv(h, tile), _cdiv(w, tile)
    hp, wp = nty * tile, ntx * tile
    xp = jnp.pad(x, ((0, 0), (PAD, hp - h + PAD), (PAD, wp - w + PAD),
                     (0, 4 * G - NF)))
    wx, w1, w2, w3, w4 = packed
    sw = tile + 2 * PAD

    kernel = functools.partial(_rdb_kernel_v3, (h, w, tile))
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
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),          # in_a
            pltpu.VMEM((sw, sw, 4 * G), x.dtype),          # in_b
            pltpu.VMEM((sw, sw, 9 * NF), x.dtype),         # b9 (shared staging)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wx, w1, w2, w3, w4, b14, b5)
    return out[:, :h, :w, :]
