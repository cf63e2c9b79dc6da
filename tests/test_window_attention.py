"""Fused window-attention Pallas kernel vs the XLA formulation.

The kernel (``ops/pallas/window_attention.py``) fuses LN → qkv →
scores(+bias,+shift-mask) → softmax → out → proj into one pass over
the NHWC map in PERMUTED pair-token order. These tests pin, in
interpret mode on CPU:

- fp32 equivalence to the production XLA path (`swinir._attention`)
  for both unshifted and shifted blocks, all window-type masks
- the permuted bias/mask construction against the module's own
  `_shift_mask` oracle
- bf16 path stays within a few output LSBs of the fp32 oracle
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2sr_tpu.models import swinir as sw
from s2sr_tpu.ops.pallas.window_attention import (
    build_attention_tables,
    window_attention_fused,
)

C, HEADS, WIN = 180, 6, 8


def _block_params(key, c=C):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm1": {"weight": 1.0 + 0.1 * jax.random.normal(k4, (c,)),
                  "bias": 0.05 * jax.random.normal(k3, (c,))},
        "attn": {
            "qkv": {"weight": jax.random.normal(k1, (c, 3 * c)) * 0.05,
                    "bias": jax.random.normal(k2, (3 * c,)) * 0.02},
            "proj": {"weight": jax.random.normal(k2, (c, c)) * 0.05,
                     "bias": jax.random.normal(k1, (c,)) * 0.02},
            "relative_position_bias_table":
                jax.random.normal(k3, ((2 * WIN - 1) ** 2, HEADS)) * 0.1,
        },
    }


def _reference(x, p, h, w, shift, dtype=jnp.float32):
    """The production XLA path for one block's LN→attention→proj part
    (without residual / roll-back), token-major."""
    bias_idx = jnp.asarray(sw.relative_position_index(WIN))
    mask = sw._shift_mask_device(h, w, WIN, WIN // 2) if shift else None
    xt = x.reshape(x.shape[0], h * w, -1).astype(dtype)
    pc = jax.tree.map(lambda a: a.astype(dtype), p)
    y = sw._layer_norm(xt, pc["norm1"]).reshape(x.shape[0], h, w, -1)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    windows = sw.window_partition(y, WIN)
    attn = sw._attention(windows, pc["attn"], HEADS, WIN, bias_idx,
                         mask if shift else None)
    return sw.window_reverse(attn, WIN, h, w)


def _kernel(x, p, shift, dtype=jnp.float32):
    tables = build_attention_tables(p["attn"], HEADS, WIN, shift,
                                    dtype=dtype)
    y = x.astype(dtype)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    return window_attention_fused(
        y, jax.tree.map(lambda a: a.astype(dtype), p["norm1"]), tables,
        HEADS, WIN, shifted=bool(shift), interpret=True)


@pytest.mark.parametrize("shift", [0, WIN // 2])
def test_fused_matches_xla_fp32(shift):
    h, w = 16, 32
    p = _block_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, C))
    want = np.asarray(_reference(x, p, h, w, shift))
    got = np.asarray(_kernel(x, p, shift))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_shifted_mask_types_differ_per_window_row_col():
    """All 4 pair-mask types engage (the grid edge windows see wrap
    regions): a larger grid exercises interior/last-col/last-row/corner
    and must still match the XLA path everywhere."""
    h, w = 24, 32
    p = _block_params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, C))
    want = np.asarray(_reference(x, p, h, w, WIN // 2))
    got = np.asarray(_kernel(x, p, WIN // 2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_batch_dim():
    h, w = 16, 16
    p = _block_params(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (3, h, w, C))
    want = np.asarray(_reference(x, p, h, w, 0))
    got = np.asarray(_kernel(x, p, 0))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_bf16_close_to_fp32_oracle():
    h, w = 16, 16
    p = _block_params(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (1, h, w, C))
    want = np.asarray(_reference(x, p, h, w, WIN // 2))
    got = np.asarray(_kernel(x, p, WIN // 2, dtype=jnp.bfloat16))
    # bf16 matmuls with f32 accumulation: activation-scale agreement
    assert np.abs(got.astype(np.float32) - want).max() < 0.05


@pytest.mark.parametrize("shift", [0, WIN // 2])
def test_block_kernel_matches_xla_fp32(shift):
    """v4: the WHOLE block (LN1→attn→proj→+res→LN2→MLP→+res) in one
    kernel pass with lane-packed qkv/proj dots — must equal the XLA
    block (without roll-back, rolled space) in fp32."""
    from s2sr_tpu.ops.pallas.window_attention import swin_block_fused

    h, w = 24, 32
    p = _block_params(jax.random.PRNGKey(8))
    hidden = C * 2
    p["norm2"] = {"weight": 1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), (C,)),
        "bias": 0.05 * jax.random.normal(jax.random.PRNGKey(10), (C,))}
    p["mlp"] = {
        "fc1": {"weight": jax.random.normal(
            jax.random.PRNGKey(11), (C, hidden)) * 0.05,
            "bias": jnp.zeros((hidden,))},
        "fc2": {"weight": jax.random.normal(
            jax.random.PRNGKey(12), (hidden, C)) * 0.05,
            "bias": jnp.zeros((C,))},
    }
    x = jax.random.normal(jax.random.PRNGKey(13), (1, h, w, C))

    # XLA reference: full _swin_block on tokens
    bias_idx = jnp.asarray(sw.relative_position_index(WIN))
    mask = sw._shift_mask_device(h, w, WIN, WIN // 2) if shift else None
    tok = x.reshape(1, h * w, C)
    want = sw._swin_block(tok, p, h, w, HEADS, WIN, shift, bias_idx,
                          mask).reshape(1, h, w, C)

    tables = build_attention_tables(p["attn"], HEADS, WIN, shift,
                                    dtype=jnp.float32)
    y = x
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    got = swin_block_fused(y, p, tables, HEADS, WIN,
                           shifted=bool(shift), interpret=True)
    if shift:
        got = jnp.roll(got, (shift, shift), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
