"""Fused window-attention Pallas kernel for SwinIR (VERDICT r4 #1).

The r5 HLO byte decomposition (``scripts/swinir_bytes.py``) showed the
512² exact SwinIR forward moves 406 GB of HBM traffic, of which >55%
of entry-level writes are pure LAYOUT MOVEMENT: the window
partition/reverse transposes, the qkv head-transposes (20.4 GB), the
materialized attention scores (14.5 GB), and the attention-output
relayouts. XLA cannot fuse across its dot boundaries, so every one of
these round-trips HBM at ~86% of measured bandwidth — the family's
roofline cap (BENCH_NOTES r4/r5).

This kernel fuses, per Swin block:

    LayerNorm → qkv projection → per-head scores (+relative-position
    bias, +shift mask) → softmax → weighted sum → output projection

into ONE pass: read the (rolled) pre-norm feature map once, write the
projected attention output once. Everything between lives in VMEM.

The layout trick that makes it free of transposes: windows are
processed as PAIRS of raster-adjacent 8×8 windows, read directly as a
(8, 16, C) spatial block of the NHWC map — the same pairing the XLA
path uses to fill the 128-lane MXU (``swinir.py::_attention``). The
block's natural row-major token order interleaves the two windows'
rows; instead of re-ordering tokens (a relayout), the relative-position
bias and shift masks are PRE-PERMUTED into that order on the host, so
attention runs on permuted tokens and the output lands back in spatial
order by construction. Attention is permutation-equivariant, so the
math is the XLA path's same-terms math (cross-window logits killed by
the same -1e9 additive; softmax in f32 vs the XLA path's bf16 — ≤ulp
scale deltas, test-pinned).

head_dim is 30 (embed 180 / 6 heads): padded to 32 zero lanes in the
packed qkv weights (zero rows in the proj weight make the pads inert).
Per-head q/k/v are produced by separate small dots (K=180 → N=32) into
distinct VMEM values — no lane slicing at non-128 offsets anywhere.

Reference semantics: ``server/app/swinir.py:138-220`` (WindowAttention
with relative position bias + shifted-window masks).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ...models import swinir as _swin


def _pair_permutation(window: int) -> np.ndarray:
    """perm[p] = pair-order token index of spatial position p.

    Spatial order: p = y·2w + x over the (w, 2w) pair block.
    Pair order:    o = (x // w)·w² + y·w + (x % w).
    """
    w = window
    p = np.arange(w * 2 * w)
    y, x = p // (2 * w), p % (2 * w)
    return (x // w) * w * w + y * w + (x % w)


def build_attention_tables(attn_params, num_heads: int, window: int,
                           shift: int, dtype=jnp.bfloat16):
    """Precompute the kernel's constant inputs for one Swin block.

    Returns a dict of arrays:
      wq/wk/wv: (heads, C, 32)   — per-head projections, d padded 30→32
      bq/bk/bv: (heads, 32)
      wo:       (heads, 32, C)   — proj split per head (sum of head
                                   contributions = the full proj matmul)
      bo:       (C,)
      bias:     (heads, N2, N2)  — relative-position bias in PERMUTED
                                   pair order, off-diagonal pair blocks
                                   at -1e9 (the pairing mask)
      masks:    (4, N2, N2)      — the 4 shift window-type pair masks,
                                   permuted (all zeros when shift == 0)
    """
    C = attn_params["qkv"]["weight"].shape[0]
    head_dim = C // num_heads
    n = window * window
    n2 = 2 * n

    # jnp throughout: params may be TRACED (the tables are built inside
    # the jitted forward — for the scan trunk, inside the scan body
    # from the stacked per-block leaves)
    wqkv = jnp.asarray(attn_params["qkv"]["weight"], jnp.float32)
    bqkv = jnp.asarray(attn_params["qkv"]["bias"], jnp.float32)
    wproj = jnp.asarray(attn_params["proj"]["weight"], jnp.float32)
    bproj = jnp.asarray(attn_params["proj"]["bias"], jnp.float32)

    def per_head(off):
        # (C, C) slice at component offset → (heads, C, 32) zero-padded
        m = wqkv[:, off:off + C].reshape(C, num_heads, head_dim)
        m = m.transpose(1, 0, 2)
        return jnp.pad(m, ((0, 0), (0, 0), (0, 32 - head_dim)))

    wq, wk, wv = (per_head(i * C) for i in range(3))
    bq, bk, bv = (jnp.pad(
        bqkv[i * C:(i + 1) * C].reshape(num_heads, head_dim),
        ((0, 0), (0, 32 - head_dim))) for i in range(3))
    # the query scale folds into wq/bq (fewer kernel ops)
    scale = head_dim ** -0.5
    wq = wq * scale
    bq = bq * scale

    wo = jnp.pad(wproj.reshape(num_heads, head_dim, C),
                 ((0, 0), (0, 32 - head_dim), (0, 0)))

    # bias in pair order: tile the (N, N) per-head bias over the 2×2
    # pair grid, kill cross-window logits, then permute to spatial
    table = jnp.asarray(attn_params["relative_position_bias_table"],
                        jnp.float32)                     # ((2w-1)², heads)
    idx = _swin.relative_position_index(window)          # (N, N)
    bias = table[jnp.asarray(idx)]                       # (N, N, heads)
    bias = bias.transpose(2, 0, 1)                       # (heads, N, N)
    bias2 = jnp.full((num_heads, n2, n2), -1e9, jnp.float32)
    bias2 = bias2.at[:, :n, :n].set(bias)
    bias2 = bias2.at[:, n:, n:].set(bias)
    perm = _pair_permutation(window)
    bias2 = bias2[:, perm[:, None], perm[None, :]]

    masks = np.zeros((4, n2, n2), np.float32)
    if shift > 0:
        # the 4 distinct window types of a shifted grid, in row-major
        # 2×2 order (interior/last-col/last-row/corner) — same
        # derivation as swinir._shift_mask_device. Pure numpy: the
        # masks are weight-independent constants.
        types = _swin._shift_mask(2 * window, 2 * window, window, shift)
        # pair types: 0 interior(0,0) · 1 last-col(0,1) ·
        #             2 last-row(2,2) · 3 corner(2,3)
        for t, (a, b) in enumerate(((0, 0), (0, 1), (2, 2), (2, 3))):
            m = np.zeros((n2, n2), np.float32)
            m[:n, :n] = types[a]
            m[n:, n:] = types[b]
            masks[t] = m[perm[:, None], perm[None, :]]

    # lane-packed forms (kernel v4): one N=3·heads·32 qkv dot and one
    # K=heads·32 proj dot instead of 18+6 quarter-filled N=32/K=32
    # passes; per-head values come from static 32-aligned lane slices
    wqkv_p = jnp.concatenate(
        [w.transpose(1, 0, 2).reshape(C, num_heads * 32)
         for w in (wq, wk, wv)], axis=1)               # (C, 3·h·32)
    bqkv_p = jnp.concatenate([b.reshape(num_heads * 32)
                              for b in (bq, bk, bv)])
    wo_cat = wo.reshape(num_heads * 32, C)

    return {
        "wq": wq.astype(dtype), "wk": wk.astype(dtype),
        "wv": wv.astype(dtype),
        "bq": bq.astype(dtype), "bk": bk.astype(dtype),
        "bv": bv.astype(dtype),
        "wo": wo.astype(dtype), "bo": bproj.astype(dtype),
        "wqkv_p": wqkv_p.astype(dtype), "bqkv_p": bqkv_p.astype(dtype),
        "wo_cat": wo_cat.astype(dtype),
        "bias": bias2,
        "masks": jnp.asarray(masks),
    }


def _attn_kernel(x_ref, gw_ref, gb_ref, wq_ref, wk_ref, wv_ref,
                 bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,
                 bias_ref, masks_ref, out_ref, *,
                 num_heads: int, window: int, shifted: bool,
                 nh: int, npair: int, pw: int, eps: float):
    w = window
    n2 = 2 * w * w
    C = x_ref.shape[-1]
    dtype = out_ref.dtype
    tokens = pw * n2

    # (w, 2w·pw, C) → pair-major (pw·N2, C): an outer-dims transpose
    # (whole-tile moves in VMEM, no sublane shuffles) — the per-pair
    # token order it produces is exactly the permuted order the
    # bias/mask tables are built in
    x = x_ref[0].reshape(w, pw, 2 * w, C).transpose(1, 0, 2, 3) \
        .reshape(tokens, C)

    # LayerNorm (fp32 statistics, like the XLA path)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * gw_ref[:].astype(jnp.float32) + gb_ref[:].astype(jnp.float32)
    ln = ln.astype(dtype)

    acc = jnp.zeros((tokens, C), jnp.float32)
    for h in range(num_heads):
        # one M=pw·N2 dot per projection: MXU-filling, no lane slicing
        q = (jax.lax.dot(ln, wq_ref[h],
                         preferred_element_type=jnp.float32)
             + bq_ref[h]).astype(dtype)
        k = (jax.lax.dot(ln, wk_ref[h],
                         preferred_element_type=jnp.float32)
             + bk_ref[h]).astype(dtype)
        v = (jax.lax.dot(ln, wv_ref[h],
                         preferred_element_type=jnp.float32)
             + bv_ref[h]).astype(dtype)
        outs = []
        for p_i in range(pw):
            sl = slice(p_i * n2, (p_i + 1) * n2)
            s = jax.lax.dot_general(
                q[sl], k[sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (N2, N2)
            s = s + bias_ref[h]
            if shifted:
                i = pl.program_id(1)
                j = pl.program_id(2)
                t = 2 * (i == nh - 1).astype(jnp.int32) \
                    + (j * pw + p_i == npair - 1).astype(jnp.int32)
                s = s + masks_ref[t]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            e = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jax.lax.dot(e.astype(dtype), v[sl],
                                    preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=0)              # (tokens, 32)
        acc = acc + jax.lax.dot(o.astype(dtype), wo_ref[h],
                                preferred_element_type=jnp.float32)
    acc = acc + bo_ref[:].astype(jnp.float32)
    out = acc.astype(dtype).reshape(pw, w, 2 * w, C).transpose(1, 0, 2, 3)
    out_ref[0] = out.reshape(w, 2 * w * pw, C)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| ≤ 1.5e-7) — Mosaic has
    no erf/erfc lowering, and the fp32 GELU path needs the exact form
    (the bf16 production path uses the tanh approximation)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_kernel(h, dtype):
    if dtype == jnp.bfloat16:
        return jax.nn.gelu(h, approximate=True)
    hf = h.astype(jnp.float32)
    return (0.5 * hf * (1.0 + _erf(hf / np.sqrt(2.0)))).astype(h.dtype)


def _block_kernel(x_ref, gw_ref, gb_ref, wqkv_ref, bqkv_ref,
                  wo_ref, bo_ref,
                  bias_ref, masks_ref,
                  g2w_ref, g2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  out_ref, *,
                  num_heads: int, window: int, shifted: bool,
                  nh: int, npair: int, pw: int, eps: float):
    """The WHOLE Swin block in one pass:

        y = x + proj(attn(LN1(x)));  out = y + fc2(gelu(fc1(LN2(y))))

    x is read once from HBM, out written once — the block's
    minimal-traffic formulation (the attention-only kernel still
    round-tripped y and the 2×-wide fc1 hidden through HBM). Runs in
    rolled space for shifted blocks (every non-attention op is
    per-token, so the roll commutes).

    MXU shape discipline (the v3→v4 step that made the kernel
    compute-efficient once the traffic was gone): qkv is ONE dot with
    heads packed in the lane dim (N = 3·heads·32) and the proj is ONE
    K = heads·32 dot over the lane-concatenated head outputs — the
    per-head N=32/K=32 formulation left 3/4 of the MXU's output lanes
    idle on the model's FLOP-dominant matmuls. Per-head q/k/v come
    from static 32-aligned lane slices (cheap vector relayout)."""
    w = window
    n2 = 2 * w * w
    C = x_ref.shape[-1]
    dtype = out_ref.dtype
    tokens = pw * n2
    H32 = num_heads * 32

    x = x_ref[0].reshape(w, pw, 2 * w, C).transpose(1, 0, 2, 3) \
        .reshape(tokens, C)

    def ln(v, wt, bt):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mean) ** 2, axis=-1, keepdims=True)
        o = (vf - mean) * jax.lax.rsqrt(var + eps)
        return (o * wt.astype(jnp.float32)
                + bt.astype(jnp.float32)).astype(dtype)

    lnx = ln(x, gw_ref[:], gb_ref[:])

    z = (jax.lax.dot(lnx, wqkv_ref[:],
                     preferred_element_type=jnp.float32)
         + bqkv_ref[:]).astype(dtype)                  # (tokens, 3·H32)

    head_outs = []
    for h in range(num_heads):
        q = z[:, h * 32:(h + 1) * 32]
        k = z[:, H32 + h * 32:H32 + (h + 1) * 32]
        v = z[:, 2 * H32 + h * 32:2 * H32 + (h + 1) * 32]
        outs = []
        for p_i in range(pw):
            sl = slice(p_i * n2, (p_i + 1) * n2)
            s = jax.lax.dot_general(
                q[sl], k[sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bias_ref[h]
            if shifted:
                i = pl.program_id(1)
                j = pl.program_id(2)
                t = 2 * (i == nh - 1).astype(jnp.int32) \
                    + (j * pw + p_i == npair - 1).astype(jnp.int32)
                s = s + masks_ref[t]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            e = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jax.lax.dot(e.astype(dtype), v[sl],
                                    preferred_element_type=jnp.float32))
        head_outs.append(jnp.concatenate(outs, axis=0).astype(dtype))
    o_cat = jnp.concatenate(head_outs, axis=1)         # (tokens, H32)
    acc = jax.lax.dot(o_cat, wo_ref[:],
                      preferred_element_type=jnp.float32)
    y = (x.astype(jnp.float32) + acc + bo_ref[:].astype(jnp.float32))

    # MLP on the attention result, residual fused
    lny = ln(y, g2w_ref[:], g2b_ref[:])
    hdn = (jax.lax.dot(lny, w1_ref[:],
                       preferred_element_type=jnp.float32)
           + b1_ref[:]).astype(dtype)
    hdn = _gelu_kernel(hdn, dtype)
    mlp = jax.lax.dot(hdn, w2_ref[:],
                      preferred_element_type=jnp.float32) + b2_ref[:]
    out = (y + mlp).astype(dtype)
    out = out.reshape(pw, w, 2 * w, C).transpose(1, 0, 2, 3)
    out_ref[0] = out.reshape(w, 2 * w * pw, C)


def swin_block_fused(x: jnp.ndarray, p_block, tables,
                     num_heads: int, window: int, shifted: bool,
                     *, pairs_per_step: int = 8,
                     eps: float = 1e-5,
                     interpret: bool = False) -> jnp.ndarray:
    """One whole Swin block (LN1→attn→proj→+res→LN2→MLP→+res) as a
    single Pallas pass over the (rolled) NHWC map. ``p_block`` is the
    block's param dict (norm1/attn/norm2/mlp); ``tables`` from
    :func:`build_attention_tables` on ``p_block['attn']``."""
    b, h, w_, c = x.shape
    assert h % window == 0 and w_ % (2 * window) == 0
    nh = h // window
    npair = w_ // (2 * window)
    pw = pairs_per_step
    while npair % pw:
        pw //= 2

    kernel = functools.partial(
        _block_kernel, num_heads=num_heads, window=window,
        shifted=shifted, nh=nh, npair=npair, pw=pw, eps=eps)

    spatial = pl.BlockSpec((1, window, 2 * window * pw, c),
                           lambda bb, i, j: (bb, i, j, 0))
    full = lambda a: pl.BlockSpec(a.shape, lambda bb, i, j: (0,) * a.ndim)

    dt = x.dtype
    args = (p_block["norm1"]["weight"].astype(dt),
            p_block["norm1"]["bias"].astype(dt),
            tables["wqkv_p"], tables["bqkv_p"],
            tables["wo_cat"], tables["bo"],
            tables["bias"], tables["masks"],
            p_block["norm2"]["weight"].astype(dt),
            p_block["norm2"]["bias"].astype(dt),
            p_block["mlp"]["fc1"]["weight"].astype(dt),
            p_block["mlp"]["fc1"]["bias"].astype(dt),
            p_block["mlp"]["fc2"]["weight"].astype(dt),
            p_block["mlp"]["fc2"]["bias"].astype(dt))
    return pl.pallas_call(
        kernel,
        grid=(b, nh, npair // pw),
        in_specs=[spatial] + [full(a) for a in args],
        out_specs=spatial,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, *args)


def window_attention_fused(x: jnp.ndarray, norm_params, tables,
                           num_heads: int, window: int, shifted: bool,
                           *, pairs_per_step: int = 16,
                           eps: float = 1e-5,
                           interpret: bool = False) -> jnp.ndarray:
    """LN + paired-window attention + proj on an NHWC map, one pass.

    ``x``: (B, H, W, C) pre-norm features (already cyclically rolled for
    shifted blocks). H must be a multiple of the window, W of 2·window
    (the exact path reflect-pads to window multiples; odd window counts
    fall back to the XLA formulation upstream).
    Returns the projected attention output in spatial order — caller
    adds the residual and (for shifted blocks) rolls back.
    """
    b, h, w_, c = x.shape
    assert h % window == 0 and w_ % (2 * window) == 0
    nh = h // window
    npair = w_ // (2 * window)
    pw = pairs_per_step
    while npair % pw:
        pw //= 2

    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, window=window,
        shifted=shifted, nh=nh, npair=npair, pw=pw, eps=eps)

    spatial = pl.BlockSpec((1, window, 2 * window * pw, c),
                           lambda bb, i, j: (bb, i, j, 0))
    full = lambda a: pl.BlockSpec(a.shape, lambda bb, i, j: (0,) * a.ndim)

    args = (norm_params["weight"].astype(x.dtype),
            norm_params["bias"].astype(x.dtype),
            tables["wq"], tables["wk"], tables["wv"],
            tables["bq"], tables["bk"], tables["bv"],
            tables["wo"], tables["bo"], tables["bias"], tables["masks"])
    return pl.pallas_call(
        kernel,
        grid=(b, nh, npair // pw),
        in_specs=[spatial] + [full(a) for a in args],
        out_specs=spatial,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, *args)
