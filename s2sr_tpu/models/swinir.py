"""SwinIR (Swin-transformer SR) — TPU-native functional implementation.

Architecture-equivalent to the reference PyTorch module
(``server/app/swinir.py:138-635``): shallow conv → RSTB groups (Swin
blocks: window attention with relative-position bias, shifted windows,
MLP, LayerNorm) → conv → residual → pixel-shuffle upsampler. The
reference keeps SwinIR unwired from live endpoints (SURVEY §2 M); here
it is a first-class registry model.

TPU-first choices:
- NHWC feature maps; window partition is pure reshape/transpose (no
  gather), attention is one batched einsum over (windows·B/2, heads,
  2N, 2N) — windows fused in pairs to fill the 128-lane MXU dims
  exactly (same-terms math, ≤1 ulp; see ``_attention``),
- relative-position bias is precomputed per window size as a dense
  (heads, N, N) table added inside the attention einsum,
- shifted windows use ``jnp.roll`` (cyclic shift + attention mask),
- the whole forward is shape-static: inputs are reflect-padded to
  window multiples exactly like the reference (``swinir.py:630-635``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Fuse WINDOW_GROUP raster-adjacent windows into one (GROUP·64)-token
# pseudo-window inside attention (same-terms math, +16% on TPU at 2 —
# see ``_attention``). 1 disables; module-level so tests/benches can
# pin other group sizes.
WINDOW_GROUP = 2

# Fused Pallas window-attention (r5, VERDICT r4 #1): LN→qkv→scores→
# softmax→out→proj in ONE kernel pass over the NHWC map — removes the
# partition/reverse/head-transpose relayout copies and the scores
# materialization that the r5 byte decomposition showed dominate the
# exact path's HBM traffic (scripts/swinir_bytes.py). "auto" = on for
# TPU backends whenever the padded width is a multiple of 2·window
# (the pairing constraint); "1"/"0" force. Same-terms math as the
# paired XLA path (softmax in f32 — test-pinned vs the fp32 oracle).
import os as _os

FUSED_ATTN = _os.environ.get("S2SR_SWINIR_FUSED_ATTN", "auto")
FUSED_ATTN_INTERPRET = False   # tests: run the kernel in interpret mode
# "block": the whole Swin block (attn + MLP + residuals) as one kernel
# pass — x read once, written once per block; "attn": the r5 v2
# attention-only kernel (the ablation/regression harness).
FUSED_LEVEL = _os.environ.get("S2SR_SWINIR_FUSED_LEVEL", "block")

# Above this trunk area the x4 upsample tail runs in haloed row strips
# (see SwinIR._tail_strips): the whole-image tail OOMs HBM past ~1280²
# — its 4H×4W×64 activation pads to 128 lanes (9 GB at 1536²).
TAIL_STRIP_AREA = 1280 * 1280
TAIL_STRIP = 128               # trunk rows per strip
_TAIL_PAD = 3                  # halo ≥ the tail's receptive field:
#   conv_before(1) + up0(1) + up1(0.5 at 2x) + conv_last(0.25 at 4x)
#   = 2.75 input px for x4 (2.875 for x8)


def _use_fused_attn(ww: int, window: int, override: str | None = None) \
        -> bool:
    """r5 measured ladder at 512² exact bf16 (BENCH_NOTES r5): unrolled
    XLA 0.457 → scan 0.560 → scan+fused kernel (16 pairs/step) 0.827
    MPix/s. The one-pair-per-step v1 kernel LOST to scan+XLA (0.498) —
    per-step overhead and MXU underfill ate the byte savings; batching
    16 pairs per grid step is what converts the traffic cut into
    wall-clock. "auto" = kernel on TPU backends when the padded width
    is a multiple of 2·window; inference only (no VJP)."""
    mode = override if override is not None else FUSED_ATTN
    if mode == "0" or ww % (2 * window) != 0:
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


# --- primitives --------------------------------------------------------

def _layer_norm(x, p, eps=1e-5):
    # statistics in fp32 regardless of the compute dtype (torch LayerNorm
    # accumulates fp32); result back in x.dtype so the matmuls stay bf16
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) \
        * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _linear(x, p):
    return x @ p["weight"] + p["bias"]


def _conv3x3(x, p):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def _gelu(x):
    # fp32 (the parity/oracle path): exact erf GELU, matching torch
    # nn.GELU. bf16 (the throughput path): tanh approximation — its
    # ≤3e-3 absolute deviation sits at the bf16 rounding floor of the
    # surrounding activations, and the exact erf costs 9% of the whole
    # forward on v5e (BENCH_NOTES r3 ablation).
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def relative_position_index(window: int) -> np.ndarray:
    """(N, N) index into the (2w-1)² bias table (torch Swin convention)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # (2, N, N)
    rel = rel.transpose(1, 2, 0)                        # (N, N, 2)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                  # (N, N)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, w·w, C)."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, -1)


def _attention(x, p, num_heads: int, window: int, bias_idx: jnp.ndarray,
               mask: jnp.ndarray | None):
    """Window multi-head self-attention with relative position bias.

    Windows are fused in raster-order groups of ``WINDOW_GROUP`` into
    (g·64)-token pseudo-windows whenever the count allows: the MXU lane
    dimension is 128 and N=64 score matrices fill half of it on both
    dims, so pairing (g=2) fills the lanes exactly and halves the
    batched-dot count (measured +16% on TPU, BENCH_NOTES r3;
    g=4 re-measured slower — score FLOPs scale with g). Cross-window
    logits get a -1e9 additive, making their softmax weights exactly
    0.0 — the paired forward sums the SAME real terms as the unpaired
    one; only the backend's matmul K-blocking may re-associate them
    (a few fp32 ulp end-to-end; test-pinned).
    """
    bw, n, c = x.shape
    nw_mask = mask.shape[0] if mask is not None else 2
    g = 1
    for cand in (WINDOW_GROUP, 2):
        if cand > 1 and bw % cand == 0 and nw_mask % cand == 0:
            g = cand
            break
    ng = g * n
    head_dim = c // num_heads
    x = x.reshape(bw // g, ng, c)
    qkv = _linear(x, p["qkv"]).reshape(bw // g, ng, 3, num_heads, head_dim)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    q = q * (head_dim ** -0.5)
    # scores in the compute dtype: the (B·nW/g, heads, Ng, Ng) matrices
    # are the model's biggest HBM tensors (bf16 halves that traffic;
    # fp32 runs — the parity tests — are unchanged)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=v.dtype)
    bias = p["relative_position_bias_table"][bias_idx]       # (N, N, heads)
    bias = jnp.tile(bias.transpose(2, 0, 1), (1, g, g))      # (h, Ng, Ng)
    if g > 1:
        blk = np.full((ng, ng), -1e9, np.float32)
        for i in range(g):
            blk[i * n:(i + 1) * n, i * n:(i + 1) * n] = 0.0
        bias = bias + jnp.asarray(blk)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        if g > 1:
            mr = mask.reshape(nw // g, g, n, n)
            mg = jnp.zeros((nw // g, ng, ng), mask.dtype)
            for i in range(g):
                mg = mg.at[:, i * n:(i + 1) * n, i * n:(i + 1) * n] \
                    .set(mr[:, i])
        else:
            mg = mask
        attn = attn.reshape(-1, nw // g, num_heads, ng, ng) \
            + mg[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bw // g, num_heads, ng, ng)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    return _linear(out, p["proj"])


def _shift_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows ((nW, N, N), 0 / -100).

    Pure numpy (shapes are static) so it folds to a constant even when
    the model is traced inside an outer jit.
    """
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    windows = img.reshape(h // window, window, w // window, window)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _shift_mask_device(h: int, w: int, window: int, shift: int) -> jnp.ndarray:
    """(nW, N, N) shift mask assembled ON DEVICE from its 4 distinct
    window types (interior / last-col / last-row / corner).

    Baking the full per-window mask as an HLO constant is O(nW·N²):
    268 MB at 1024² — past the remote-compile relay's request-size
    limit (HTTP 413, the measured exact-path killer in the r4 ceiling
    probe). But the wrap-region structure inside a window depends only
    on whether the window sits in the LAST row/column of the grid, so
    a 2×2-window grid produces exactly the 4 distinct types in
    row-major order; a (nW,) int index then gathers the full mask on
    device. Bit-identical to :func:`_shift_mask` (test-pinned)."""
    types = jnp.asarray(_shift_mask(2 * window, 2 * window, window, shift))
    nh, nw_ = h // window, w // window
    r = (np.arange(nh) == nh - 1).astype(np.int32) * 2
    c = (np.arange(nw_) == nw_ - 1).astype(np.int32)
    idx = jnp.asarray((r[:, None] + c[None, :]).reshape(-1))
    return jnp.take(types, idx, axis=0)


def _swin_block(x, p, h: int, w: int, num_heads: int, window: int,
                shift: int, bias_idx, mask, fused: bool = False):
    b = x.shape[0]
    shortcut = x
    if fused:
        from ..ops.pallas.window_attention import (
            build_attention_tables,
            swin_block_fused,
            window_attention_fused,
        )

        tables = build_attention_tables(p["attn"], num_heads, window,
                                        shift, dtype=x.dtype)
        img = x.reshape(b, h, w, -1)
        if shift > 0:
            img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
        if FUSED_LEVEL == "block":
            # whole block in one pass (attn + MLP + both residuals in
            # rolled space — per-token ops commute with the roll)
            out = swin_block_fused(
                img, p, tables, num_heads, window, shifted=shift > 0,
                interpret=FUSED_ATTN_INTERPRET)
            if shift > 0:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
            return out.reshape(b, h * w, -1)
        y = window_attention_fused(
            img, p["norm1"], tables, num_heads, window,
            shifted=shift > 0, interpret=FUSED_ATTN_INTERPRET)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
    else:
        y = _layer_norm(x, p["norm1"]).reshape(b, h, w, -1)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y, window)
        attn = _attention(windows, p["attn"], num_heads, window, bias_idx,
                          mask if shift > 0 else None)
        y = window_reverse(attn, window, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = shortcut + y.reshape(b, h * w, -1)
    y = _layer_norm(x, p["norm2"])
    y = _linear(_gelu(_linear(y, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    return x + y


def _rstb(x, p, h: int, w: int, depths: int, num_heads: int, window: int,
          bias_idx, mask, fused: bool = False):
    """Residual Swin Transformer Block: blocks + trailing conv + residual."""
    b = x.shape[0]
    y = x
    for i in range(depths):
        shift = 0 if i % 2 == 0 else window // 2
        y = _swin_block(y, p["blocks"][i], h, w, num_heads, window, shift,
                        bias_idx, mask, fused=fused)
    img = y.reshape(b, h, w, -1)
    img = _conv3x3(img, p["conv"])
    return x + img.reshape(b, h * w, -1)


def _pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C·f²) → (B, f·H, f·W, C), torch PixelShuffle semantics
    (channel-major ordering: out channel c comes from input channels
    c·f² + fy·f + fx)."""
    b, h, w, cf = x.shape
    c = cf // (factor * factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, c)


# --- model -------------------------------------------------------------

class SwinIR:
    """Classical-SR SwinIR (M config by default, ref ``swinir.py:494-635``)."""

    def __init__(
        self,
        scale: int = 4,
        embed_dim: int = 180,
        depths: Sequence[int] = (6, 6, 6, 6, 6, 6),
        num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6),
        window_size: int = 8,
        mlp_ratio: float = 2.0,
        num_feat: int = 64,
        img_range: float = 1.0,
        dtype=jnp.float32,
        remat: bool = False,
        scan: bool = True,
        fused_attn: str | None = None,
    ):
        self.scale = scale
        self.embed_dim = embed_dim
        self.depths = tuple(depths)
        self.num_heads = tuple(num_heads)
        self.window_size = window_size
        self.mlp_ratio = mlp_ratio
        self.num_feat = num_feat
        self.img_range = img_range
        self.dtype = dtype
        # rematerialise each RSTB on backward (training memory knob —
        # mirrors rrdbnet_apply(remat=True); no-op for inference)
        self.remat = remat
        # scan-over-blocks formulation (VERDICT r4 #2): the trunk is 36
        # structurally identical Swin blocks; rolling them into
        # lax.scan(layers) × lax.scan(block pairs) shrinks the HLO to
        # ~2 block bodies instead of 36 — the unrolled 36864-window
        # graph is what blew up the compiler at 1536² exact (BENCH_
        # NOTES r4 ceiling walk). Identical math in identical order;
        # requires a uniform config (all depths even + equal, equal
        # heads — true for every registry SwinIR), else falls back to
        # the unrolled loop.
        self.scan = (scan and len(set(depths)) == 1
                     and len(set(num_heads)) == 1
                     and depths[0] % 2 == 0)
        # Per-instance override of the module-level FUSED_ATTN switch:
        # None follows the module default; "0" forces the XLA path
        # (training MUST use it — pallas_call has no VJP here); "1"
        # forces the kernel where the width constraint allows.
        self.fused_attn = fused_attn
        # DIV2K RGB mean, as in the original SwinIR (3-channel models).
        # CONSCIOUS FIX of a reference quirk: the reference's forward
        # unconditionally overwrites the mean with zeros
        # (server/app/swinir.py:613-615,626), which would mis-normalise
        # the released weights (trained WITH the mean); we keep the
        # mean the weights expect. Note the reference also feeds
        # cv2-BGR straight in (its "Convert BGR to RGB" comment at
        # :684-687 converts nothing) — the engine reproduces that
        # channel order via bgr_order like the RRDBNet path.
        self.mean = jnp.asarray([0.4488, 0.4371, 0.4040], jnp.float32)
        self._bias_idx = jnp.asarray(relative_position_index(window_size))

    # --- init ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        dim = self.embed_dim
        w = self.window_size
        ks = iter(jax.random.split(key, 4096))

        def lin(cin, cout, std=0.02):
            return {
                "weight": jax.random.truncated_normal(
                    next(ks), -2, 2, (cin, cout), jnp.float32) * std,
                "bias": jnp.zeros((cout,), jnp.float32),
            }

        def norm(c):
            return {"weight": jnp.ones((c,), jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32)}

        def conv_p(cin, cout):
            fan = 9 * cin
            return {
                "kernel": jax.random.normal(next(ks), (3, 3, cin, cout),
                                            jnp.float32) * math.sqrt(2 / fan),
                "bias": jnp.zeros((cout,), jnp.float32),
            }

        def block(heads):
            hidden = int(dim * self.mlp_ratio)
            return {
                "norm1": norm(dim),
                "attn": {
                    "qkv": lin(dim, dim * 3),
                    "proj": lin(dim, dim),
                    "relative_position_bias_table": jax.random.truncated_normal(
                        next(ks), -2, 2,
                        ((2 * w - 1) ** 2, heads), jnp.float32) * 0.02,
                },
                "norm2": norm(dim),
                "mlp": {"fc1": lin(dim, hidden), "fc2": lin(hidden, dim)},
            }

        layers = []
        for depth, heads in zip(self.depths, self.num_heads):
            layers.append({
                "blocks": [block(heads) for _ in range(depth)],
                "conv": conv_p(dim, dim),
            })

        params: Params = {
            "conv_first": conv_p(3, dim),
            "norm_embed": norm(dim),
            "layers": layers,
            "norm": norm(dim),
            "conv_after_body": conv_p(dim, dim),
            "conv_before_upsample": conv_p(dim, self.num_feat),
        }
        # pixel-shuffle chain: x4 = two ×2 stages (ref Upsample :406-420)
        ups = []
        s = self.scale
        while s > 1:
            if s % 2 == 0:
                ups.append(conv_p(self.num_feat, 4 * self.num_feat))
                s //= 2
            elif s == 3:
                ups.append(conv_p(self.num_feat, 9 * self.num_feat))
                s = 1
            else:
                raise ValueError(f"unsupported scale {self.scale}")
        params["upsample"] = ups
        params["conv_last"] = conv_p(self.num_feat, 3)
        return params

    # --- forward -------------------------------------------------------
    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) in [0,1] → (B, sH, sW, 3)."""
        dtype = self.dtype
        w = self.window_size
        b, h0, w0, _ = x.shape
        pad_h = (w - h0 % w) % w
        pad_w = (w - w0 % w) % w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        b, h, ww, _ = x.shape

        x = (x - self.mean) * self.img_range
        x = x.astype(dtype)

        # cast the whole tree to the compute dtype ONCE: fp32 params left
        # in place silently promote every linear/attention matmul back to
        # fp32 (the pre-r3 state — see BENCH_NOTES r3 for the measured
        # cost); LayerNorm still computes its statistics in fp32
        if dtype != jnp.float32:
            params = jax.tree.map(lambda a: a.astype(dtype), params)

        feat = _conv3x3(x, params["conv_first"])
        tokens = feat.reshape(b, h * ww, -1)
        tokens = _layer_norm(tokens, params["norm_embed"])

        fused = _use_fused_attn(ww, w, self.fused_attn)
        mask = None if fused else _shift_mask_device(h, ww, w, w // 2)
        if self.scan:
            body = self._trunk_scan(params["layers"], tokens, h, ww, mask,
                                    fused)
        else:
            rstb = (jax.checkpoint(_rstb,
                                   static_argnums=(2, 3, 4, 5, 6, 9))
                    if self.remat else _rstb)
            body = tokens
            for layer, depth, heads in zip(params["layers"], self.depths,
                                           self.num_heads):
                body = rstb(body, layer, h, ww, depth, heads, w,
                            self._bias_idx, mask, fused)
        body = _layer_norm(body, params["norm"])
        body_img = body.reshape(b, h, ww, -1)
        feat = feat + _conv3x3(body_img, params["conv_after_body"])

        if h * ww > TAIL_STRIP_AREA and h >= 2 * _TAIL_PAD + TAIL_STRIP:
            out = self._tail_strips(params, feat)
        else:
            out = self._tail(params, feat)
        out = out.astype(jnp.float32) / self.img_range + self.mean
        return out[:, :h0 * self.scale, :w0 * self.scale, :]

    def _tail(self, params, feat):
        """conv_before_upsample → pixel-shuffle chain → conv_last."""
        feat = jax.nn.leaky_relu(
            _conv3x3(feat, params["conv_before_upsample"]), 0.01)
        s = self.scale
        for up in params["upsample"]:
            factor = 2 if s % 2 == 0 else 3
            feat = _pixel_shuffle(_conv3x3(feat, up), factor)
            s //= factor if factor != 3 else 3
            if factor == 3:
                s = 1
        return _conv3x3(feat, params["conv_last"])

    def _tail_strips(self, params, feat):
        """The upsample tail in haloed row strips (lax.map).

        Root cause of the r4 "1536² compiler blow-up", pinned this
        round: the whole-image tail's (1, 4H, 4W, 64) activation is
        lane-padded to 128 channels — 9.01 GB at 1536², and the
        program OOMs HBM at 18.02/15.75 GB (full error in BENCH_NOTES
        r5). The tail is purely local (3×3 convs + pixel shuffles,
        receptive field 2.75 input px for x4), so strips with a 3-row halo
        reproduce the whole-image result; strip windows are CLAMPED to
        the image so edge strips keep the exact 'SAME' zero-padding
        semantics of the whole forward (float-identical — the window
        always covers each kept pixel's full receptive field).
        """
        b, h, w_, c = feat.shape
        pad = _TAIL_PAD
        strip = TAIL_STRIP
        n = -(-h // strip)
        win = strip + 2 * pad
        sc = self.scale

        starts = jnp.minimum(jnp.maximum(jnp.arange(n) * strip - pad, 0),
                             h - win)
        offs = jnp.arange(n) * strip - starts   # crop offset inside win

        def one(args):
            start, off = args
            s = jax.lax.dynamic_slice_in_dim(feat, start, win, axis=1)
            y = self._tail(params, s)           # (b, sc·win, sc·w, 3)
            # the last (partial) strip's crop may overrun the window —
            # those rows are truncated by the caller's [:h·sc]; pad so
            # dynamic_slice never clamps (clamping would SHIFT rows)
            y = jnp.pad(y, ((0, 0), (0, sc * strip), (0, 0), (0, 0)))
            return jax.lax.dynamic_slice_in_dim(y, off * sc, sc * strip,
                                                axis=1)

        ys = jax.lax.map(one, (starts, offs))   # (n, b, sc·strip, ·, 3)
        out = ys.transpose(1, 0, 2, 3, 4).reshape(b, n * strip * sc,
                                                  w_ * sc, -1)
        return out[:, :h * sc]

    def _trunk_scan(self, layers, tokens, h: int, ww: int, mask,
                    fused: bool = False):
        """All RSTBs as lax.scan(layers) × lax.scan(shift pairs).

        Same ops in the same order as the unrolled trunk (test-pinned
        equal); the HLO carries TWO block bodies total instead of 36,
        which is what lets the exact whole-image path compile past the
        r4 1280² ceiling."""
        w = self.window_size
        depth = self.depths[0]
        heads = self.num_heads[0]
        bias_idx = self._bias_idx

        # stack the 36 block pytrees → leaves (L, depth/2, 2, ...), and
        # the per-layer convs → (L, ...). Stacking happens at trace
        # time over parameter leaves only (~0.5 MB/block — noise next
        # to the activations).
        blocks = [b for layer in layers for b in layer["blocks"]]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        L = len(layers)
        stacked = jax.tree.map(
            lambda a: a.reshape((L, depth // 2, 2) + a.shape[1:]), stacked)
        convs = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[layer["conv"] for layer in layers])

        def pair_body(y, pair_p):
            p0 = jax.tree.map(lambda a: a[0], pair_p)
            p1 = jax.tree.map(lambda a: a[1], pair_p)
            y = _swin_block(y, p0, h, ww, heads, w, 0, bias_idx, mask,
                            fused=fused)
            y = _swin_block(y, p1, h, ww, heads, w, w // 2, bias_idx,
                            mask, fused=fused)
            return y, None

        def layer_body(x, layer_p):
            pair_ps, conv_p = layer_p
            y, _ = jax.lax.scan(pair_body, x, pair_ps)
            img = y.reshape(y.shape[0], h, ww, -1)
            img = _conv3x3(img, conv_p)
            return x + img.reshape(x.shape), None

        body_fn = (jax.checkpoint(layer_body, prevent_cse=False)
                   if self.remat else layer_body)
        body, _ = jax.lax.scan(body_fn, tokens, (stacked, convs))
        return body

    @partial(jax.jit, static_argnums=0)
    def _jitted(self, params, x):
        return self.apply(params, x)

    def __call__(self, params, x):
        return self._jitted(params, x)


# --- torch checkpoint conversion ---------------------------------------

def convert_swinir_state_dict(sd, depths: Sequence[int] = (6,) * 6) -> Params:
    """Released SwinIR ``.pth`` → our pytree (OIHW→HWIO, linear t())."""
    # 'params' wins over 'params_ema' when both are present — the same
    # (asymmetric vs RRDBNet) preference as the reference loader
    # (server/app/swinir.py:674-677)
    if "params" in sd:
        sd = sd["params"]
    if "params_ema" in sd:
        sd = sd["params_ema"]

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def lin(prefix):
        return {"weight": t(f"{prefix}.weight"),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    def norm(prefix):
        return {"weight": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    def conv(prefix):
        kernel = np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))
        return {"kernel": jnp.asarray(kernel),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    layers = []
    for li, depth in enumerate(depths):
        base = f"layers.{li}.residual_group.blocks"
        blocks = []
        for bi in range(depth):
            prefix = f"{base}.{bi}"
            blocks.append({
                "norm1": norm(f"{prefix}.norm1"),
                "attn": {
                    "qkv": lin(f"{prefix}.attn.qkv"),
                    "proj": lin(f"{prefix}.attn.proj"),
                    "relative_position_bias_table": jnp.asarray(
                        np.asarray(sd[f"{prefix}.attn.relative_position_bias_table"])),
                },
                "norm2": norm(f"{prefix}.norm2"),
                "mlp": {"fc1": lin(f"{prefix}.mlp.fc1"),
                        "fc2": lin(f"{prefix}.mlp.fc2")},
            })
        layers.append({"blocks": blocks, "conv": conv(f"layers.{li}.conv")})

    params: Params = {
        "conv_first": conv("conv_first"),
        "norm_embed": norm("patch_embed.norm"),
        "layers": layers,
        "norm": norm("norm"),
        "conv_after_body": conv("conv_after_body"),
        "conv_before_upsample": conv("conv_before_upsample.0"),
        "conv_last": conv("conv_last"),
    }
    ups = []
    i = 0
    while f"upsample.{i}.weight" in sd:
        ups.append(conv(f"upsample.{i}"))
        i += 2  # torch Upsample interleaves PixelShuffle modules
    params["upsample"] = ups
    return params
