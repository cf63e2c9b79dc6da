"""int8 (W8A8) quantized RRDBNet trunk for the serving engine.

The v5e MXU advertises 2x int8 throughput over bf16 (394 vs 197 TOPS);
``scripts/bench_int8.py`` measured XLA delivering 1.18-1.51x at the
production packed-RDB conv shapes in ISOLATION (64->192: 1.51x,
32->wide: 1.18-1.27x). At chain level the win does NOT survive:
the 12-RDB chain runs 49.4 TF/s-equiv int8 vs 55-57 bf16 (BENCH_NOTES
round-3 int8 section — ablations attribute ~4% to the scale/round/clip
glue and ~8% to the int8 convs themselves in context, whose int32
outputs double the write bytes of bf16 and whose cast pass does not
fuse into the conv on this backend). The mode is retained as a fully
tested quantization harness (and for backends where the trade-off
differs), NOT as a throughput win on v5e via XLA; bf16 stays the
default and the recommended production dtype.

Scheme (standard symmetric W8A8, chosen for XLA-fusibility):

- **Weights**: per-output-channel symmetric int8 on the *packed*
  per-source kernels of :func:`.rrdbnet._rdb_packed` (wx 64->192,
  w1..w4 32->{160,128,96,64}) — scale ``max|k| / 127`` over (kh,kw,cin).
- **Activations**: per-tensor symmetric int8 with STATIC scales
  calibrated once per weight set (:func:`calibrate_act_scales` runs one
  fp32 forward and records each conv input's max|x|); runtime cost of
  quantization is one fused elementwise pass per conv input. In the
  packed formulation the lrelu outputs x1..x4 feed ONLY the next conv,
  so they are written straight to int8 — the quantized trunk moves
  *fewer* HBM bytes than bf16, not more.
- **Accumulation**: conv int8xint8 -> int32 on the MXU
  (``preferred_element_type``), dequantized by the folded factor
  ``s_act * s_w[cout]`` into the model dtype; the prefix-accumulator
  dance, biases, lrelu and the 0.2 residual scaling are unchanged from
  ``_rdb_packed`` (rrdbnet.py:114) — only the conv arithmetic differs.
- **Unquantized**: conv_first/conv_body/upsample tail (~8% of FLOPs,
  and the quality-critical final pixels) stay in the model dtype.

The exact-padding ``mask`` contract survives quantization: symmetric
quant maps 0 -> 0 exactly, so re-zeroed bucket padding behaves as the
conv's own SAME zero border, and bucketed int8 serving equals the
unpadded int8 forward bit-for-bit (same argument as rrdbnet_apply's
docstring, now in integer arithmetic).

Matches the hot loop of the reference's fp32 engine
(cnn_super_resolution.py:140-158) in capability; quantization has no
reference counterpart (the reference serves fp32 torch on CPU).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .rrdbnet import (Params, _conv, _lrelu, _nearest_x2,  # noqa: F401
                      _rdb_packed, packed_prefix_kernels, rrdbnet_apply)

QParams = Any


def _pack_rdb_kernels(p: Params) -> tuple[jnp.ndarray, ...]:
    """The five per-source packed kernels of ``_rdb_packed`` in fp32 —
    the layout definition lives in ONE place
    (:func:`.rrdbnet.packed_prefix_kernels`), shared with the
    production bf16 path so they cannot drift apart."""
    return tuple(w.astype(jnp.float32) for w in packed_prefix_kernels(p))


def _quantize_kernel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: returns (w8, scale[cout])."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)                       # all-zero channel guard
    w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return w8, s.astype(jnp.float32)


def _rdb_stats(x: jnp.ndarray, p: Params) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 packed forward that also returns max|input| of each conv."""
    g = p["conv1"]["kernel"].shape[-1]
    ws = _pack_rdb_kernels(p)

    def b(k):
        return p[f"conv{k}"]["bias"].astype(jnp.float32)

    def conv(t, w):
        return jax.lax.conv_general_dilated(
            t, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    maxes = [jnp.max(jnp.abs(x))]
    acc = conv(x, ws[0])
    for i in range(1, 5):
        xi = _lrelu(acc[..., -g:] + b(i))
        maxes.append(jnp.max(jnp.abs(xi)))
        acc = acc[..., :-g] + conv(xi, ws[i])
    x5 = acc + b(5)
    return x5 * 0.2 + x, jnp.stack(maxes)


def calibrate_act_scales(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """One fp32 trunk forward on calibration input ``x`` (N,H,W,3 in
    [0,1]); returns per-conv activation scales, shape (B, 3, 5) f32.

    Static per-tensor scales: the trunk's feature statistics are stable
    across natural inputs (BENCH_NOTES int8 section measures the
    resulting quality margin); outliers at inference clip at +-127.
    """
    x = x.astype(jnp.float32)
    feat = _conv(x, params["conv_first"], jnp.float32)

    def block(carry, bp):
        out, m1 = _rdb_stats(carry, bp["rdb1"])
        out, m2 = _rdb_stats(out, bp["rdb2"])
        out, m3 = _rdb_stats(out, bp["rdb3"])
        return out * 0.2 + carry, jnp.stack([m1, m2, m3])

    _, maxes = jax.lax.scan(block, feat, params["body"])
    return jnp.maximum(maxes, 1e-12) / 127.0        # (B, 3, 5)


def quantize_body(params: Params, act_scales: jnp.ndarray) -> QParams:
    """Quantize the RRDB trunk given calibrated activation scales.

    Returns the pytree scanned by the int8 block: per RDB, int8 packed
    kernels ``w8``, folded dequant factors ``deq[cout] = s_act * s_w``,
    inverse act scales ``qm = 1/s_act``, and fp32 biases.
    """
    def one_rdb(p, s_act):                          # s_act: (5,)
        ws = _pack_rdb_kernels(p)
        w8, deq, qm = [], [], []
        for i, w in enumerate(ws):
            k8, sw = _quantize_kernel(w)
            w8.append(k8)
            deq.append((sw * s_act[i]).astype(jnp.float32))
            qm.append((1.0 / s_act[i]).astype(jnp.float32))
        return {
            "w8": tuple(w8), "deq": tuple(deq), "qm": jnp.stack(qm),
            "b": tuple(p[f"conv{k}"]["bias"].astype(jnp.float32)
                       for k in range(1, 6)),
        }

    def one_block(bp, s_block):                     # s_block: (3, 5)
        return {f"rdb{i + 1}": one_rdb(bp[f"rdb{i + 1}"], s_block[i])
                for i in range(3)}

    return jax.vmap(one_block)(params["body"], act_scales)


def _conv_i8(x8: jnp.ndarray, w8: jnp.ndarray, deq: jnp.ndarray,
             dtype) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x8, w8, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * deq).astype(dtype)


def _quant(x: jnp.ndarray, qm: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) * qm)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _rdb_packed_i8(x: jnp.ndarray, qp: QParams, dtype,
                   mask=None) -> jnp.ndarray:
    """int8 twin of ``_rdb_packed`` (rrdbnet.py:114) — same prefix
    accumulator, conv arithmetic on the MXU int8 path."""
    g = qp["w8"][4].shape[2]                        # w4: (3,3,g,nf)
    w8, deq, qm, b = qp["w8"], qp["deq"], qp["qm"], qp["b"]

    def m(t):
        return t if mask is None else t * mask

    def bias(i):
        return b[i].astype(dtype)

    acc = _conv_i8(_quant(x, qm[0]), w8[0], deq[0], dtype)       # 192
    x1 = _quant(m(_lrelu(acc[..., -g:] + bias(0))), qm[1])
    acc = acc[..., :-g] + _conv_i8(x1, w8[1], deq[1], dtype)     # 160
    x2 = _quant(m(_lrelu(acc[..., -g:] + bias(1))), qm[2])
    acc = acc[..., :-g] + _conv_i8(x2, w8[2], deq[2], dtype)     # 128
    x3 = _quant(m(_lrelu(acc[..., -g:] + bias(2))), qm[3])
    acc = acc[..., :-g] + _conv_i8(x3, w8[3], deq[3], dtype)     # 96
    x4 = _quant(m(_lrelu(acc[..., -g:] + bias(3))), qm[4])
    x5 = acc[..., :-g] + _conv_i8(x4, w8[4], deq[4], dtype) + bias(4)
    return m(x5 * jnp.asarray(0.2, dtype) + x)


def _rrdb_i8(x: jnp.ndarray, qblock: QParams, dtype, mask=None) -> jnp.ndarray:
    out = _rdb_packed_i8(x, qblock["rdb1"], dtype, mask)
    out = _rdb_packed_i8(out, qblock["rdb2"], dtype, mask)
    out = _rdb_packed_i8(out, qblock["rdb3"], dtype, mask)
    return out * jnp.asarray(0.2, dtype) + x


def quantize_rrdbnet(params: Params, calib: jnp.ndarray) -> QParams:
    """Calibrate + quantize in one step. ``calib``: (N,H,W,3) in [0,1]."""
    return quantize_body(params, calibrate_act_scales(params, calib))


def rrdbnet_apply_int8(
    params: Params,
    qbody: QParams,
    x: jnp.ndarray,
    scale: int = 4,
    dtype: jnp.dtype = jnp.bfloat16,
    up_sub_batch: int | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Forward pass with the int8 trunk; glue (conv_first/body/upsample,
    masking, sub-batched tail) shared with :func:`.rrdbnet.rrdbnet_apply`
    via ``body_override``."""
    def block_fn(carry, qblock, m):
        return _rrdb_i8(carry, qblock, dtype, m)

    return rrdbnet_apply(
        params, x, scale=scale, dtype=dtype, up_sub_batch=up_sub_batch,
        mask=mask, body_override=(block_fn, qbody))
