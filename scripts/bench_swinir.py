"""SwinIR on-TPU decomposition bench (VERDICT r2 #7).

Times the full forward and targeted ablations (differential against the
full model) to locate where the 0.249 MPix/s goes: the attention
score/context matmuls (tiny K=30 batched shapes), softmax, or the
dense GEMMs. Ablations change the math — they exist only to attribute
time, never to ship.

Usage: python scripts/bench_swinir.py [--runs 3] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from s2sr_tpu.models import swinir as sw

sw._attention_orig = sw._attention


def attention_paired(xx, p, num_heads, window, bias_idx, mask):
    """Candidate to ship: fuse 2 windows into one 128-token
    pseudo-window. The MXU's lane dim is 128; N=64 windows fill
    half of it on both score dims. Pairing fills M and N exactly
    (2x the score FLOPs, on off-window blocks killed by a -1e9
    additive -> softmax weights exactly 0.0, so the math is exact:
    a float sum is unchanged by interspersed +0.0 terms). Halves
    the batched-dot count and doubles the AV contraction to
    K=128."""
    bw, n, c = xx.shape
    if bw % 2:
        return sw._attention_orig(xx, p, num_heads, window, bias_idx, mask)
    head_dim = c // num_heads
    n2 = 2 * n
    x2 = xx.reshape(bw // 2, n2, c)
    qkv = sw._linear(x2, p["qkv"]).reshape(bw // 2, n2, 3, num_heads,
                                           head_dim)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    q = q * (head_dim ** -0.5)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=v.dtype)
    bias = p["relative_position_bias_table"][bias_idx]   # (n, n, h)
    big = jnp.tile(bias.transpose(2, 0, 1), (1, 2, 2))   # (h, 2n, 2n)
    off = np.full((n2, n2), -1e9, np.float32)
    off[:n, :n] = 0.0
    off[n:, n:] = 0.0
    attn = attn + (big[None] + jnp.asarray(off)).astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        mr = mask.reshape(nw // 2, 2, n, n)
        m2 = jnp.zeros((nw // 2, n2, n2), mask.dtype)
        m2 = m2.at[:, :n, :n].set(mr[:, 0]).at[:, n:, n:].set(mr[:, 1])
        attn = attn.reshape(-1, nw // 2, num_heads, n2, n2) \
            + m2[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bw // 2, num_heads, n2, n2)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    return sw._linear(out, p["proj"])


def bench_engine(args) -> None:
    """Production-path numbers (the r2 0.249 figure measured a raw
    window batch and understated serving: ≤512² images run the exact
    whole-image forward, not windows). SREngine enables the
    compilation cache itself."""
    from s2sr_tpu.models.engine import SREngine

    engine = SREngine("swinir_x4", weights_dir="models", dtype="bfloat16")
    rng = np.random.default_rng(0)
    for size in (512, 1024):
        img = jnp.asarray(
            rng.integers(0, 256, (size, size, 3), np.uint8))
        out = engine.enhance_device(img)
        _ = np.asarray(out[:1, :1])
        t0 = time.perf_counter()
        outs = [engine.enhance_device(img) for _ in range(args.runs)]
        for o in outs:
            _ = np.asarray(o[:1, :1])
        dt = (time.perf_counter() - t0) / args.runs
        print(json.dumps({
            "case": f"engine_{size}",
            "path": ("whole (exact)"
                     if size * size <= engine.engage_area
                     else "tiled t256/p16/b16 (approx)"),
            "s_per_image": round(dt, 3),
            "mpix_s": round(size * size / dt / 1e6, 3),
        }), flush=True)


def bench_ceiling(args) -> None:
    """Walk the exact whole-image forward up in size until it stops
    fitting: sets the SWINIR_EXACT_AREA engage default from measurement
    instead of the inherited CPU rule (engine.py docstring)."""
    from s2sr_tpu.models.engine import SREngine

    rng = np.random.default_rng(0)
    for size in (int(s) for s in args.sizes.split(",")):
        try:
            eng = SREngine("swinir_x4", weights_dir="models",
                           dtype="bfloat16", exact_area=size * size)
            img = jnp.asarray(
                rng.integers(0, 256, (size, size, 3), np.uint8))
            out = eng.enhance_device(img)
            _ = np.asarray(out[:1, :1])
            t0 = time.perf_counter()
            outs = [eng.enhance_device(img) for _ in range(args.runs)]
            for o in outs:
                _ = np.asarray(o[:1, :1])
            dt = (time.perf_counter() - t0) / args.runs
            print(json.dumps({
                "case": f"exact_{size}", "s_per_image": round(dt, 3),
                "mpix_s": round(size * size / dt / 1e6, 3),
            }), flush=True)
        except Exception as e:  # OOM / compile failure ends the walk
            print(json.dumps({"case": f"exact_{size}",
                              "error": type(e).__name__,
                              "detail": str(e)[:200]}), flush=True)
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--modes", default="full,attn_bf16,no_softmax,no_attn")
    # extra modes: attn_nt (transpose-free einsum layout — exact math,
    # candidate to ship), gelu_tanh (approx gelu), no_ln (identity
    # layernorms), no_mlp (skip the MLP) — the last three change the
    # math and exist only to attribute time
    ap.add_argument("--engine", action="store_true",
                    help="bench the PRODUCTION path (SREngine.enhance_"
                         "device) instead of a raw window batch: whole-"
                         "image ≤512², halo-tiled (t256/p16/b16) above")
    ap.add_argument("--ceiling", action="store_true",
                    help="probe the EXACT whole-image path ceiling "
                         "(VERDICT r4 #3): force exact_area=size² per "
                         "size and walk up until HBM OOM / compile "
                         "failure; reports MPix/s per size")
    ap.add_argument("--sizes", default="512,640,768,896,1024,1280,1536")
    args = ap.parse_args()

    if args.ceiling:
        bench_ceiling(args)
        return
    if args.engine:
        bench_engine(args)
        return

    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    from s2sr_tpu.models import swinir as sw

    model = sw.SwinIR(scale=4, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # the engine's halo window batch for a 512² image: 4 × 288²
    tile = args.size // 2 + 32
    x = jnp.asarray(rng.random((4, tile, tile, 3)), jnp.float32)

    orig_attention = sw._attention
    orig_gelu = sw._gelu
    orig_ln = sw._layer_norm
    orig_block = sw._swin_block
    orig_partition = sw.window_partition
    orig_reverse = sw.window_reverse
    orig_rstb = sw._rstb

    def attention_nt(xx, p, num_heads, window, bias_idx, mask):
        """Exact math, transpose-free layouts: qkv stays (bw, n, h, d);
        scores/context via einsums whose operands never materialise the
        (bw, h, n, d) transposed copies."""
        bw, n, c = xx.shape
        head_dim = c // num_heads
        qkv = sw._linear(xx, p["qkv"]).reshape(bw, n, 3, num_heads, head_dim)
        q = qkv[:, :, 0] * (head_dim ** -0.5)
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=v.dtype)
        bias = p["relative_position_bias_table"][bias_idx]
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, num_heads, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, c)
        return sw._linear(out, p["proj"])

    def block_no_mlp(x, p, h, w, num_heads, window, shift, bias_idx, mask):
        b = x.shape[0]
        shortcut = x
        y = sw._layer_norm(x, p["norm1"]).reshape(b, h, w, -1)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = sw.window_partition(y, window)
        attn = sw._attention(windows, p["attn"], num_heads, window, bias_idx,
                             mask if shift > 0 else None)
        y = sw.window_reverse(attn, window, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return shortcut + y.reshape(b, h * w, -1)

    def partition_notranspose(x, w):
        """Shape-correct, math-wrong window grouping WITHOUT the
        6-D transpose (groups each contiguous w²-pixel run as a
        'window') — times the partition/reverse relayout cost."""
        return x.reshape(-1, w * w, x.shape[-1])

    def reverse_notranspose(x, w, h, ww):
        b = x.shape[0] // ((h // w) * (ww // w))
        return x.reshape(b, h, ww, -1)

    def rstb_noconv(x, p, h, w, depths, num_heads, window, bias_idx, mask):
        y = x
        for i in range(depths):
            shift = 0 if i % 2 == 0 else window // 2
            y = sw._swin_block(y, p["blocks"][i], h, w, num_heads, window,
                               shift, bias_idx, mask)
        return x + y          # skip the trailing 180->180 conv3x3

    def block_no_roll(x, p, h, w, num_heads, window, shift, bias_idx, mask):
        b = x.shape[0]
        shortcut = x
        y = sw._layer_norm(x, p["norm1"]).reshape(b, h, w, -1)
        windows = sw.window_partition(y, window)   # rolls skipped
        attn = sw._attention(windows, p["attn"], num_heads, window,
                             bias_idx, None)
        y = sw.window_reverse(attn, window, h, w)
        x = shortcut + y.reshape(b, h * w, -1)
        y = sw._layer_norm(x, p["norm2"])
        y = sw._linear(sw._gelu(sw._linear(y, p["mlp"]["fc1"])),
                       p["mlp"]["fc2"])
        return x + y

    def block_roll_concat(x, p, h, w, num_heads, window, shift, bias_idx,
                          mask):
        """Exact math: cyclic shift lowered as slice+concat instead of
        jnp.roll (candidate to ship if faster)."""
        def shift2(y, sh, sw_):
            sh %= y.shape[1]
            sw_ %= y.shape[2]
            y = jnp.concatenate([y[:, sh:], y[:, :sh]], axis=1)
            y = jnp.concatenate([y[:, :, sw_:], y[:, :, :sw_]], axis=2)
            return y

        b = x.shape[0]
        shortcut = x
        y = sw._layer_norm(x, p["norm1"]).reshape(b, h, w, -1)
        if shift > 0:
            y = shift2(y, shift, shift)
        windows = sw.window_partition(y, window)
        attn = sw._attention(windows, p["attn"], num_heads, window, bias_idx,
                             mask if shift > 0 else None)
        y = sw.window_reverse(attn, window, h, w)
        if shift > 0:
            y = shift2(y, h - shift, w - shift)
        x = shortcut + y.reshape(b, h * w, -1)
        y = sw._layer_norm(x, p["norm2"])
        y = sw._linear(sw._gelu(sw._linear(y, p["mlp"]["fc1"])),
                       p["mlp"]["fc2"])
        return x + y

    def make_attention(mode):
        def attention(xx, p, num_heads, window, bias_idx, mask):
            bw, n, c = xx.shape
            head_dim = c // num_heads
            qkv = sw._linear(xx, p["qkv"]).reshape(bw, n, 3, num_heads,
                                                   head_dim)
            q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
            if mode == "no_attn":
                out = v  # skip both attention matmuls + softmax
            else:
                q = q * (head_dim ** -0.5)
                pref = (jnp.float32 if mode == "attn_f32"
                        else jnp.bfloat16)
                if mode == "attn_noscores":
                    # broadcast stands in for the QK matmul (times the
                    # score GEMM + its output write; rest unchanged)
                    attn = jnp.broadcast_to(
                        q[..., :1] * k[..., :1].sum(-2, keepdims=True)
                        .swapaxes(-1, -2), (bw, num_heads, n, n))
                else:
                    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                                      preferred_element_type=pref)
                bias = p["relative_position_bias_table"][bias_idx]
                attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
                if mask is not None:
                    nw = mask.shape[0]
                    attn = attn.reshape(bw // nw, nw, num_heads, n, n) \
                        + mask[None, :, None].astype(attn.dtype)
                    attn = attn.reshape(bw, num_heads, n, n)
                if mode == "no_softmax":
                    attn = (attn * 0.01).astype(v.dtype)
                else:
                    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
                if mode == "attn_noav":
                    # keep scores+softmax live, skip the AV matmul
                    out = v + attn[..., :1].astype(v.dtype)
                else:
                    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
            return sw._linear(out, p["proj"])
        return attention

    for mode in args.modes.split(","):
        sw._attention = orig_attention
        sw._gelu = orig_gelu
        sw._layer_norm = orig_ln
        sw._swin_block = orig_block
        sw.window_partition = orig_partition
        sw.window_reverse = orig_reverse
        sw._rstb = orig_rstb
        sw.WINDOW_GROUP = 2
        if mode in ("attn_bf16", "attn_f32", "no_softmax", "no_attn",
                    "attn_noscores", "attn_noav"):
            sw._attention = make_attention(mode)
        elif mode == "attn_nt":
            sw._attention = attention_nt
        elif mode == "pair":
            sw._attention = attention_paired
        elif mode == "nopair":
            # production formulation with pairing disabled (the pre-r3
            # per-window layout) — the regression comparator
            sw.WINDOW_GROUP = 1
        elif mode == "quad":
            # 256-token pseudo-windows (4 windows): fills two lane
            # tiles; score FLOPs ×4 vs unpaired — measure, don't guess
            sw.WINDOW_GROUP = 4
        elif mode == "gelu_tanh":
            sw._gelu = lambda x: jax.nn.gelu(x, approximate=True)
        elif mode == "no_ln":
            sw._layer_norm = lambda x, p, eps=1e-5: x
        elif mode == "no_mlp":
            sw._swin_block = block_no_mlp
        elif mode == "no_partition":
            sw.window_partition = partition_notranspose
            sw.window_reverse = reverse_notranspose
        elif mode == "no_roll":
            sw._swin_block = block_no_roll
        elif mode == "no_rstb_conv":
            sw._rstb = rstb_noconv
        elif mode == "roll_concat":
            sw._swin_block = block_roll_concat
        fwd = jax.jit(lambda p, xx: model.apply(p, xx))
        t0 = time.perf_counter()
        out = fwd(params, x)
        _ = np.asarray(out.ravel()[:1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.runs):
            out = fwd(params, x)
            _ = np.asarray(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / args.runs
        px = args.size * args.size
        print(json.dumps({"mode": mode, "s": round(dt, 3),
                          "mpix_s": round(px / dt / 1e6, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
    sw._attention = orig_attention


if __name__ == "__main__":
    main()
