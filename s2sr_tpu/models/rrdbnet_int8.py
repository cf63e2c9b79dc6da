"""int8 (W8A8) quantized RRDBNet trunk for the serving engine.

The v5e MXU advertises 2x int8 throughput over bf16 (394 vs 197 TOPS);
``scripts/bench_int8.py`` measured XLA delivering 1.18-1.51x at the
production packed-RDB conv shapes in ISOLATION (64->192: 1.51x,
32->wide: 1.18-1.27x). Chain-level truth (BENCH_NOTES round-3 int8
section):

- **full W8A8** (every conv): 49.4 TF/s-equiv vs 55-57 bf16 — LOSES
  ~12% (ablations: ~4% scale/round/clip glue, ~8% the int8 convs in
  context — int32 outputs double bf16's write bytes and the cast pass
  does not fuse into the conv on this backend);
- **mixed** (ONLY the 64->192 wx conv — 46% of FLOPs, the 1.51x
  winner — with one quant + one dequant per RDB as the entire glue):
  56.9 vs 55.2 TF/s same-session — **+3%, the one formulation that
  beats bf16**, with a far smaller quality delta than full W8A8
  (one conv quantized instead of five).

Engine ``dtype="int8"`` uses the mixed formulation; the full-W8A8 path
stays available (``mode="full"``) as the measured-closed harness.
bf16 remains the default serving dtype — it is the one pinned
byte-identical to the fp32 oracle.

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


def quantize_body_mixed(params: Params, act_scales: jnp.ndarray) -> QParams:
    """Mixed-precision quantization: ONLY the 64->192 stage conv (wx —
    46% of RDB FLOPs, the one conv with a large measured int8 MXU win:
    1.51x isolated) is quantized; the four 32->wide convs stay in the
    model dtype. One quant pass on the 64-ch RDB input + one dequant on
    the 192-ch output per RDB is the entire glue — measured +3% over
    the bf16 chain (BENCH_NOTES int8 section, i8mix), where full W8A8
    loses 12%. Float kernels are NOT duplicated here: the mixed forward
    scans (params['body'], qbody) jointly."""
    def one_rdb(p, s_act):
        wx = _pack_rdb_kernels(p)[0]
        w8, sw = _quantize_kernel(wx)
        return {"wx8": w8,
                "deq": (sw * s_act[0]).astype(jnp.float32),
                "qm": (1.0 / s_act[0]).astype(jnp.float32)}

    def one_block(bp, s_block):
        return {f"rdb{i + 1}": one_rdb(bp[f"rdb{i + 1}"], s_block[i])
                for i in range(3)}

    return jax.vmap(one_block)(params["body"], act_scales)


def _rdb_packed_mixed(x: jnp.ndarray, p: Params, qp: QParams, dtype,
                      mask=None) -> jnp.ndarray:
    """Mixed twin of ``_rdb_packed``: int8 wx conv, bf16 everything
    else; identical prefix-accumulator structure."""
    g = p["conv1"]["kernel"].shape[-1]
    _, w1, w2, w3, w4 = packed_prefix_kernels(p)

    def m(t):
        return t if mask is None else t * mask

    def b(k):
        return p[f"conv{k}"]["bias"].astype(dtype)

    def conv(t, w):
        return jax.lax.conv_general_dilated(
            t, w.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    acc = _conv_i8(_quant(x, qp["qm"]), qp["wx8"], qp["deq"], dtype)
    x1 = m(_lrelu(acc[..., -g:] + b(1)))
    acc = acc[..., :-g] + conv(x1, w1)
    x2 = m(_lrelu(acc[..., -g:] + b(2)))
    acc = acc[..., :-g] + conv(x2, w2)
    x3 = m(_lrelu(acc[..., -g:] + b(3)))
    acc = acc[..., :-g] + conv(x3, w3)
    x4 = m(_lrelu(acc[..., -g:] + b(4)))
    x5 = acc[..., :-g] + conv(x4, w4) + b(5)
    return m(x5 * jnp.asarray(0.2, dtype) + x)


def _rrdb_mixed(x, bp, qb, dtype, mask=None):
    out = _rdb_packed_mixed(x, bp["rdb1"], qb["rdb1"], dtype, mask)
    out = _rdb_packed_mixed(out, bp["rdb2"], qb["rdb2"], dtype, mask)
    out = _rdb_packed_mixed(out, bp["rdb3"], qb["rdb3"], dtype, mask)
    return out * jnp.asarray(0.2, dtype) + x


def quantize_rrdbnet(params: Params, calib: jnp.ndarray,
                     mode: str = "mixed") -> QParams:
    """Calibrate + quantize in one step. ``calib``: (N,H,W,3) in [0,1].

    ``mode``: "mixed" (default — the only formulation that beats bf16,
    +3%) or "full" (all five convs W8A8 — the measured-closed harness,
    −12% but maximal quantization coverage)."""
    scales = calibrate_act_scales(params, calib)
    if mode == "mixed":
        return quantize_body_mixed(params, scales)
    if mode == "full":
        return quantize_body(params, scales)
    raise ValueError(f"unknown int8 mode {mode!r}")


def rrdbnet_apply_int8(
    params: Params,
    qbody: QParams,
    x: jnp.ndarray,
    scale: int = 4,
    dtype: jnp.dtype = jnp.bfloat16,
    up_sub_batch: int | None = None,
    mask: jnp.ndarray | None = None,
    mode: str = "mixed",
) -> jnp.ndarray:
    """Forward pass with the quantized trunk; glue (conv_first/body/
    upsample, masking, sub-batched tail) shared with
    :func:`.rrdbnet.rrdbnet_apply` via ``body_override``. ``mode`` must
    match the mode ``qbody`` was built with (:func:`quantize_rrdbnet`)."""
    if mode == "mixed":
        def block_fn(carry, leaves, m):
            bp, qb = leaves
            return _rrdb_mixed(carry, bp, qb, dtype, m)

        scanned = (params["body"], qbody)
    else:
        def block_fn(carry, qblock, m):
            return _rrdb_i8(carry, qblock, dtype, m)

        scanned = qbody

    return rrdbnet_apply(
        params, x, scale=scale, dtype=dtype, up_sub_batch=up_sub_batch,
        mask=mask, body_override=(block_fn, scanned))
