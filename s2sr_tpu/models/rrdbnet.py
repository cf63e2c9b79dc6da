"""RRDBNet (Real-ESRGAN generator) — TPU-native Flax implementation.

Architecture-equivalent to the reference PyTorch model
(``server/app/cnn_super_resolution.py:73-158``): residual-in-residual
dense blocks (3 RDBs × 5 convs, dense concat, 0.2 residual scaling),
LeakyReLU(0.2), nearest-×2 upsample + conv twice for x4.

TPU-first design decisions (not a translation):

- **NHWC layout** end to end — the native TPU conv layout; torch OIHW
  weights are transposed once at conversion time
  (:mod:`s2sr_tpu.models.weights`).
- **Dense concats as partial-conv sums.** ``conv(concat(x, x1, ...))``
  is algebraically split into per-input convolutions summed together, so
  no (H, W, 192) concat buffers are materialised in HBM; XLA fuses each
  partial conv into one MXU pass over the stored slices of the weight.
- **``lax.scan`` over the 23 RRDB blocks** with stacked parameters: one
  compiled block body instead of 23 inlined copies — ~20× smaller HLO
  and far faster compiles, identical math.
- **bf16 compute / fp32 params** by default; the fp32 residual path is
  preserved for the final output to keep a tight PSNR budget.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _conv(x: jnp.ndarray, p: Params, dtype) -> jnp.ndarray:
    """3×3 SAME conv, NHWC × HWIO."""
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(dtype)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, 0.2 * x)


def _conv_raw(x: jnp.ndarray, kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _rdb(x: jnp.ndarray, p: Params, dtype) -> jnp.ndarray:
    """Residual dense block — wide-output "delta" formulation.

    conv_k sees ``concat(x, x1, …, x_{k-1})``. Convolution is linear in
    its input channels, so each conv's kernel splits into per-source
    slices, and all slices that consume the *same* source tensor are
    batched into one wide conv the moment that source exists:

        conv(x,  [K1ₓ|K2ₓ|K3ₓ|K4ₓ|K5ₓ])   → 64→192
        conv(x1, [K2₁|K3₁|K4₁|K5₁])        → 32→160
        conv(x2, [K3₂|K4₂|K5₂])            → 32→128
        conv(x3, [K4₃|K5₃])                → 32→96
        conv(x4, [K5₄])                     → 32→64

    Identical math to the concatenated formulation, but every conv has
    ≥64 output channels — the narrow 32-lane convs that waste 3/4 of
    the MXU's 128 output lanes disappear (measured ~2× on v5e: narrow
    RDB ≈ 22 TF/s, wide convs 33–40 TF/s).
    """
    g = p["conv1"]["kernel"].shape[-1]      # growth channels (32)
    nf = x.shape[-1]                         # num_feat (64)

    def x_slice(k, lo, hi):
        return p[f"conv{k}"]["kernel"][:, :, lo:hi, :]

    # batched kernels per source tensor
    wx = jnp.concatenate([x_slice(k, 0, nf) for k in (1, 2, 3, 4, 5)], axis=-1)
    w1 = jnp.concatenate([x_slice(k, nf, nf + g) for k in (2, 3, 4, 5)], axis=-1)
    w2 = jnp.concatenate([x_slice(k, nf + g, nf + 2 * g) for k in (3, 4, 5)], axis=-1)
    w3 = jnp.concatenate([x_slice(k, nf + 2 * g, nf + 3 * g) for k in (4, 5)], axis=-1)
    w4 = x_slice(5, nf + 3 * g, nf + 4 * g)

    def b(k):
        return p[f"conv{k}"]["bias"].astype(dtype)

    px = _conv_raw(x, wx, dtype)
    p1, p2, p3, p4, p5 = (px[..., :g], px[..., g:2 * g], px[..., 2 * g:3 * g],
                          px[..., 3 * g:4 * g], px[..., 4 * g:])
    x1 = _lrelu(p1 + b(1))
    q = _conv_raw(x1, w1, dtype)
    q2, q3, q4, q5 = (q[..., :g], q[..., g:2 * g], q[..., 2 * g:3 * g],
                      q[..., 3 * g:])
    x2 = _lrelu(p2 + q2 + b(2))
    r = _conv_raw(x2, w2, dtype)
    r3, r4, r5 = r[..., :g], r[..., g:2 * g], r[..., 2 * g:]
    x3 = _lrelu(p3 + q3 + r3 + b(3))
    s = _conv_raw(x3, w3, dtype)
    s4, s5 = s[..., :g], s[..., g:]
    x4 = _lrelu(p4 + q4 + r4 + s4 + b(4))
    t5 = _conv_raw(x4, w4, dtype)
    x5 = p5 + q5 + r5 + s5 + t5 + b(5)
    return x5 * jnp.asarray(0.2, dtype) + x


def packed_prefix_kernels(p: Params) -> tuple:
    """The five per-source kernels in the PREFIX accumulator layout.

    Output-column order per source is (5, 4, 3, 2, ...) so the
    accumulator reads ``[a5|a4|a3|a2|a1]`` and each stage consumes a
    32-lane *tail* while the hot operand stays a lane-0-aligned prefix
    (see :func:`_rdb_packed`). This is the ONE definition of the packed
    layout — both the bf16 production path and the int8 quantizer
    (:mod:`.rrdbnet_int8`) consume it; change it here and both move
    together.
    """
    g = p["conv1"]["kernel"].shape[-1]
    nf = p["conv1"]["kernel"].shape[-2]          # conv1 sees only x

    def sl(k, lo, hi):
        return p[f"conv{k}"]["kernel"][:, :, lo:hi, :]

    wx = jnp.concatenate([sl(k, 0, nf) for k in (5, 4, 3, 2, 1)], axis=-1)
    w1 = jnp.concatenate([sl(k, nf, nf + g) for k in (5, 4, 3, 2)], axis=-1)
    w2 = jnp.concatenate([sl(k, nf + g, nf + 2 * g) for k in (5, 4, 3)],
                         axis=-1)
    w3 = jnp.concatenate([sl(k, nf + 2 * g, nf + 3 * g) for k in (5, 4)],
                         axis=-1)
    w4 = sl(5, nf + 3 * g, nf + 4 * g)
    return wx, w1, w2, w3, w4


def _rdb_packed(x: jnp.ndarray, p: Params, dtype, mask=None) -> jnp.ndarray:
    """Delta RDB with an eagerly-accumulated, prefix-shrinking buffer.

    Same per-source wide convs as :func:`_rdb`, but instead of keeping
    every wide output alive and summing 32-lane slices lazily at each
    activation (stage k reads k different wide tensors — the r1
    isolation measured those lane-padded slice reads at ~30% of RDB
    time), the future-stage contributions live in ONE accumulator laid
    out ``[a5|a4|…|a_{k+1}]``. The weight column order matches, so each
    stage is: drop the consumed 32-lane *tail*, add the new conv's
    output densely (a lane-0-aligned prefix slice — the hot operand
    stays tile-aligned; measured +5% over the suffix layout), activate
    the next tail. Addition order per lane is unchanged → bit-identical
    to :func:`_rdb` in any dtype. Measured 35.8 → 46.0 TF/s over
    :func:`_rdb` on v5e (BENCH_NOTES r2).
    """
    g = p["conv1"]["kernel"].shape[-1]
    wx, w1, w2, w3, w4 = packed_prefix_kernels(p)

    def b(k):
        return p[f"conv{k}"]["bias"].astype(dtype)

    def m(t):
        # Exact-padding mask (see rrdbnet_apply): every conv input must
        # be zero outside the true image rectangle so the bucket border
        # behaves as the model's own zero-pad SAME border. Zeros add
        # exactly in fp — masked bucketed output is bit-identical to the
        # unpadded forward on the true rectangle.
        return t if mask is None else t * mask

    acc = _conv_raw(x, wx, dtype)                       # [a5|a4|a3|a2|a1] 192
    x1 = m(_lrelu(acc[..., -g:] + b(1)))
    acc = acc[..., :-g] + _conv_raw(x1, w1, dtype)      # [a5|a4|a3|a2] 160
    x2 = m(_lrelu(acc[..., -g:] + b(2)))
    acc = acc[..., :-g] + _conv_raw(x2, w2, dtype)      # [a5|a4|a3] 128
    x3 = m(_lrelu(acc[..., -g:] + b(3)))
    acc = acc[..., :-g] + _conv_raw(x3, w3, dtype)      # [a5|a4] 96
    x4 = m(_lrelu(acc[..., -g:] + b(4)))
    x5 = acc[..., :-g] + _conv_raw(x4, w4, dtype) + b(5)
    return m(x5 * jnp.asarray(0.2, dtype) + x)


def _rrdb(x: jnp.ndarray, p: Params, dtype, mask=None) -> jnp.ndarray:
    # packed-accumulator RDB: bit-identical to _rdb, +22% on v5e
    # (35.8 → 43.7 TF/s on the 16×276² 12-RDB chain — BENCH_NOTES r2)
    out = _rdb_packed(x, p["rdb1"], dtype, mask)
    out = _rdb_packed(out, p["rdb2"], dtype, mask)
    out = _rdb_packed(out, p["rdb3"], dtype, mask)
    return out * jnp.asarray(0.2, dtype) + x


def _nearest_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour ×2 upsample (NHWC), equals F.interpolate(mode='nearest')."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def _up_conv_fused(x: jnp.ndarray, p: Params, dtype) -> jnp.ndarray:
    """``conv3×3(nearest_×2(x))`` without materialising the ×4 buffer.

    Because nearest-×2 duplicates each source pixel, every output phase
    (dy, dx ∈ {0,1}) sees at most 2×2 distinct source pixels; the four
    phase kernels are *combinations of the original taps* and can be
    stacked into one low-res conv ``C → 4C`` followed by a ×2 pixel
    shuffle. Identical math to the reference upsample
    (``cnn_super_resolution.py:146-154``) but: no (N, 2H, 2W, C)
    broadcast intermediate in HBM (the batch-64 OOM), and a 4×-wider
    MXU-friendly output. Verified bit-comparable in the parity tests.
    """
    w = p["kernel"].astype(dtype)      # (3, 3, Cin, Cout)
    bias = p["bias"].astype(dtype)
    cin, cout = w.shape[2], w.shape[3]
    zero = jnp.zeros_like(w[0])

    # kernel-row combinations per vertical phase (offset −1, 0, +1)
    rows = {
        0: [w[0], w[1] + w[2], zero],
        1: [zero, w[0] + w[1], w[2]],
    }

    def combine_cols(wr, dx):          # wr: (3kx, Cin, Cout)
        zero_c = jnp.zeros_like(wr[0])
        if dx == 0:
            return jnp.stack([wr[0], wr[1] + wr[2], zero_c], 0)
        return jnp.stack([zero_c, wr[0] + wr[1], wr[2]], 0)

    phases = []
    for dy in (0, 1):
        stacked = jnp.stack(rows[dy], 0)          # (3ky, 3kx, Cin, Cout)
        for dx in (0, 1):
            phases.append(jnp.stack(
                [combine_cols(stacked[ky], dx) for ky in range(3)], 0))
    w4 = jnp.stack(phases, axis=-1)               # (3,3,Cin,Cout,4)
    w4 = w4.reshape(3, 3, cin, cout * 4)          # channel = c*4 + dy*2 + dx

    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w4, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.repeat(bias, 4)
    n, h, ww, _ = out.shape
    out = out.reshape(n, h, ww, cout, 2, 2)
    out = out.transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(n, h * 2, ww * 2, cout)


def rrdbnet_apply(
    params: Params,
    x: jnp.ndarray,
    scale: int = 4,
    dtype: jnp.dtype = jnp.bfloat16,
    use_pallas: bool = False,
    up_sub_batch: int | None = None,
    mask: jnp.ndarray | None = None,
    body_override: tuple | None = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Forward pass. ``x``: (N, H, W, 3) float in [0, 1] → (N, sH, sW, 3).

    ``params['body']`` holds the RRDB stack with a leading block axis;
    the body runs as one ``lax.scan``. With ``use_pallas`` the residual
    dense blocks run through the fused Pallas kernel
    (:mod:`s2sr_tpu.ops.pallas.fused_rdb`) instead of XLA convs.

    ``up_sub_batch`` splits the upsample tail into sequential
    ``lax.map`` groups of that size: the low-res trunk (92% of FLOPs)
    runs at the full batch — bigger batches measure ~+7% MXU rate —
    while the ×4-resolution activations (the HBM peak: batch 32 of
    276² windows needs ~19.6 GB monolithic) only ever exist for one
    sub-group. Identical math and output order.

    ``mask`` (broadcastable to (N, H, W, 1), values 0/1) makes a
    zero-padded bucket shape compute the *exact* unpadded forward on
    the true rectangle: every conv input is re-zeroed outside the
    rectangle, so each of the ~345 SAME convs sees the same zeros it
    would see from its own padding at the true border (the serving
    engine's fixed-bucket executables become exact for every upload
    size — reference computes small images untiled/exactly,
    ``cnn_super_resolution.py:226``). Adding exact zeros is exact in
    floating point, so the masked result is bit-identical to the
    unpadded forward. Not supported together with ``use_pallas``.

    ``body_override``: ``(block_fn, scanned_tree)`` replaces the RRDB
    trunk: ``block_fn(carry, per_block_leaves, mask) -> out`` is scanned
    over ``scanned_tree`` instead of the default ``_rrdb`` over
    ``params['body']`` (used by the int8 trunk,
    :mod:`s2sr_tpu.models.rrdbnet_int8`).
    """
    if mask is not None and use_pallas:
        raise NotImplementedError("mask + use_pallas not supported")
    if mask is not None:
        # cast once: a float32 mask would upcast every bf16 product
        mask = mask.astype(dtype)

    def m(t):
        return t if mask is None else t * mask

    feat = m(_conv(x, params["conv_first"], dtype))

    if use_pallas:
        # v4 is the round-3 kernel (ref-resident f32 prefix accumulator,
        # border-only masks — see ops/pallas/fused_rdb_v4.py and the
        # BENCH_NOTES r3 ladder); opt-in until it beats the packed XLA
        # path at the model level.
        from ..ops.pallas.fused_rdb import pack_rdb_weights_v2
        from ..ops.pallas.fused_rdb_v4 import rdb_pallas_v4

        def block(carry, block_params):
            out = carry
            for name in ("rdb1", "rdb2", "rdb3"):
                packed, b14, b5 = pack_rdb_weights_v2(block_params[name],
                                                      dtype=dtype)
                out = rdb_pallas_v4(out.astype(dtype), packed, b14, b5,
                                    tile=144, stage_taps=3)
            return out * jnp.asarray(0.2, dtype) + carry, None
    else:
        def block(carry, block_params):
            return _rrdb(carry, block_params, dtype, mask), None

    scanned = params["body"]
    if body_override is not None:
        override_fn, scanned = body_override

        def block(carry, block_leaves):          # noqa: F811
            return override_fn(carry, block_leaves, mask), None

    if remat:
        # Rematerialise each RRDB block on the backward pass: training
        # the 23-block flagship keeps only one block's activations live
        # instead of ~345 convs' worth (~16 GB at batch 16 × 48² crops —
        # over the v5e's HBM). Inference paths never pay the recompute
        # (remat is a no-op without a gradient).
        block = jax.checkpoint(block)

    body_feat, _ = jax.lax.scan(block, feat, scanned)
    body_feat = _conv(body_feat, params["conv_body"], dtype)
    feat = m(feat + body_feat)

    if mask is None:
        m2 = m4 = None
    else:
        mb = jnp.broadcast_to(mask.astype(dtype),
                              (feat.shape[0], *mask.shape[-3:-1], 1))
        m2 = _nearest_x2(mb)
        m4 = _nearest_x2(m2)

    def upsample(f: jnp.ndarray, mm2=None, mm4=None) -> jnp.ndarray:
        mtop = mm4 if scale == 4 else mm2   # mask at the final resolution
        f = _lrelu(_up_conv_fused(f, params["conv_up1"], dtype))
        if mm2 is not None:
            f = f * mm2
        if scale == 4:
            f = _lrelu(_up_conv_fused(f, params["conv_up2"], dtype))
            if mm4 is not None:
                f = f * mm4
        f = _lrelu(_conv(f, params["conv_hr"], dtype))
        if mtop is not None:
            f = f * mtop
        return _conv(f, params["conv_last"], dtype).astype(jnp.float32)

    n = feat.shape[0]
    if up_sub_batch and 0 < up_sub_batch < n:
        # full groups via lax.map + a (smaller) remainder group, so the
        # x4-res residency bound holds for ANY batch size — a silent
        # monolithic fallback on non-divisible n would defeat the bound
        n_full = (n // up_sub_batch) * up_sub_batch

        def regroup(t):
            return t[:n_full].reshape(n_full // up_sub_batch, up_sub_batch,
                                      *t.shape[1:])

        if mask is None:
            out = jax.lax.map(upsample, regroup(feat))
        else:
            out = jax.lax.map(lambda fm: upsample(*fm),
                              (regroup(feat), regroup(m2), regroup(m4)))
        out = out.reshape(n_full, *out.shape[2:])
        if n_full < n:
            tail = (upsample(feat[n_full:]) if mask is None else
                    upsample(feat[n_full:], m2[n_full:], m4[n_full:]))
            out = jnp.concatenate([out, tail], axis=0)
        return out
    return upsample(feat, m2, m4)


class RRDBNet:
    """Thin config + init wrapper around the functional forward pass."""

    def __init__(
        self,
        num_in_ch: int = 3,
        num_out_ch: int = 3,
        num_feat: int = 64,
        num_block: int = 23,
        num_grow_ch: int = 32,
        scale: int = 4,
        dtype: jnp.dtype = jnp.bfloat16,
    ):
        self.num_in_ch = num_in_ch
        self.num_out_ch = num_out_ch
        self.num_feat = num_feat
        self.num_block = num_block
        self.num_grow_ch = num_grow_ch
        self.scale = scale
        self.dtype = dtype

    def init(self, key: jax.Array) -> Params:
        """Kaiming-style random init with the checkpoint's parameter shapes."""
        nf, gc = self.num_feat, self.num_grow_ch

        def conv_p(key, cin, cout):
            k1, _ = jax.random.split(key)
            fan_in = 9 * cin
            w = jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)
            w = w * math.sqrt(2.0 / fan_in) * 0.1  # ESRGAN-style scaled init
            return {"kernel": w, "bias": jnp.zeros((cout,), jnp.float32)}

        keys = iter(jax.random.split(key, 8 + self.num_block * 15))

        def rdb_p():
            return {
                "conv1": conv_p(next(keys), nf, gc),
                "conv2": conv_p(next(keys), nf + gc, gc),
                "conv3": conv_p(next(keys), nf + 2 * gc, gc),
                "conv4": conv_p(next(keys), nf + 3 * gc, gc),
                "conv5": conv_p(next(keys), nf + 4 * gc, nf),
            }

        blocks = [
            {"rdb1": rdb_p(), "rdb2": rdb_p(), "rdb3": rdb_p()}
            for _ in range(self.num_block)
        ]
        body = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

        return {
            "conv_first": conv_p(next(keys), self.num_in_ch, nf),
            "body": body,
            "conv_body": conv_p(next(keys), nf, nf),
            "conv_up1": conv_p(next(keys), nf, nf),
            "conv_up2": conv_p(next(keys), nf, nf),
            "conv_hr": conv_p(next(keys), nf, nf),
            "conv_last": conv_p(next(keys), nf, self.num_out_ch),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return rrdbnet_apply(params, x, scale=self.scale, dtype=self.dtype)

    @partial(jax.jit, static_argnums=0)
    def _jitted(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, x)

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self._jitted(params, x)


def num_parameters(params: Params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
