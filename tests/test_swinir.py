"""SwinIR parity vs an independent torch-functional oracle (tiny config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2sr_tpu.models.swinir import (
    SwinIR,
    convert_swinir_state_dict,
    relative_position_index,
)

DIM, HEADS, DEPTHS, WIN, SCALE, NF = 12, (2, 2), (2, 2), 4, 2, 8


def make_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = torch.randn(cout, cin, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * 0.02

    def norm(name, c):
        sd[f"{name}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.02

    def conv(name, cin, cout):
        sd[f"{name}.weight"] = torch.randn(cout, cin, 3, 3, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * 0.02

    conv("conv_first", 3, DIM)
    norm("patch_embed.norm", DIM)
    for li, depth in enumerate(DEPTHS):
        for bi in range(depth):
            p = f"layers.{li}.residual_group.blocks.{bi}"
            norm(f"{p}.norm1", DIM)
            lin(f"{p}.attn.qkv", DIM, DIM * 3)
            lin(f"{p}.attn.proj", DIM, DIM)
            sd[f"{p}.attn.relative_position_bias_table"] = (
                torch.randn((2 * WIN - 1) ** 2, HEADS[li], generator=g) * 0.05)
            norm(f"{p}.norm2", DIM)
            lin(f"{p}.mlp.fc1", DIM, DIM * 2)
            lin(f"{p}.mlp.fc2", DIM * 2, DIM)
        conv(f"layers.{li}.conv", DIM, DIM)
    norm("norm", DIM)
    conv("conv_after_body", DIM, DIM)
    conv("conv_before_upsample.0", DIM, NF)
    conv("upsample.0", NF, 4 * NF)   # one x2 pixel-shuffle stage
    conv("conv_last", NF, 3)
    return sd


def oracle(sd, x: torch.Tensor) -> torch.Tensor:
    """Functional torch evaluation of the published SwinIR equations."""
    mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1)
    b, _, h0, w0 = x.shape
    ph, pw = (WIN - h0 % WIN) % WIN, (WIN - w0 % WIN) % WIN
    x = F.pad(x, (0, pw, 0, ph), mode="reflect")
    x = x - mean
    _, _, h, w = x.shape

    def c(name, t):
        return F.conv2d(t, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=1)

    def ln(name, t):
        return F.layer_norm(t, (DIM,), sd[f"{name}.weight"], sd[f"{name}.bias"])

    def linear(name, t):
        return F.linear(t, sd[f"{name}.weight"], sd[f"{name}.bias"])

    feat = c("conv_first", x)
    tokens = feat.flatten(2).transpose(1, 2)       # (B, HW, C)
    tokens = ln("patch_embed.norm", tokens)

    idx = torch.from_numpy(relative_position_index(WIN)).long()

    def win_part(t):  # (B, H, W, C) -> (B*nW, N, C)
        B = t.shape[0]
        t = t.view(B, h // WIN, WIN, w // WIN, WIN, DIM)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(-1, WIN * WIN, DIM)

    def win_rev(t, B):
        t = t.view(B, h // WIN, w // WIN, WIN, WIN, DIM)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(B, h, w, DIM)

    # shifted-window mask
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    s = WIN // 2
    for hs in (slice(0, -WIN), slice(-WIN, -s), slice(-s, None)):
        for ws in (slice(0, -WIN), slice(-WIN, -s), slice(-s, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = img.view(1, h // WIN, WIN, w // WIN, WIN, 1).permute(
        0, 1, 3, 2, 4, 5).reshape(-1, WIN * WIN)
    mask = (mw[:, None, :] - mw[:, :, None])
    mask = torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))

    body = tokens
    for li, depth in enumerate(DEPTHS):
        heads = HEADS[li]
        res_in = body
        for bi in range(depth):
            p = f"layers.{li}.residual_group.blocks.{bi}"
            shift = 0 if bi % 2 == 0 else WIN // 2
            shortcut = body
            t = ln(f"{p}.norm1", body).view(b, h, w, DIM)
            if shift:
                t = torch.roll(t, (-shift, -shift), (1, 2))
            tw = win_part(t)
            B_ = tw.shape[0]
            qkv = linear(f"{p}.attn.qkv", tw).reshape(
                B_, WIN * WIN, 3, heads, DIM // heads).permute(2, 0, 3, 1, 4)
            q, k_, v = qkv[0], qkv[1], qkv[2]
            attn = (q * (DIM // heads) ** -0.5) @ k_.transpose(-2, -1)
            bias = sd[f"{p}.attn.relative_position_bias_table"][
                idx.view(-1)].view(WIN * WIN, WIN * WIN, heads)
            attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
            if shift:
                nw = mask.shape[0]
                attn = attn.view(B_ // nw, nw, heads, WIN * WIN, WIN * WIN)
                attn = attn + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(B_, heads, WIN * WIN, WIN * WIN)
            attn = attn.softmax(-1)
            out = (attn @ v).transpose(1, 2).reshape(B_, WIN * WIN, DIM)
            out = linear(f"{p}.attn.proj", out)
            t = win_rev(out, b)
            if shift:
                t = torch.roll(t, (shift, shift), (1, 2))
            body = shortcut + t.reshape(b, h * w, DIM)
            t2 = ln(f"{p}.norm2", body)
            t2 = linear(f"{p}.mlp.fc2", F.gelu(linear(f"{p}.mlp.fc1", t2)))
            body = body + t2
        conv_out = c(f"layers.{li}.conv",
                     body.transpose(1, 2).view(b, DIM, h, w))
        body = res_in + conv_out.flatten(2).transpose(1, 2)

    body = ln("norm", body)
    feat = feat + c("conv_after_body", body.transpose(1, 2).view(b, DIM, h, w))
    feat = F.leaky_relu(c("conv_before_upsample.0", feat), 0.01)
    feat = F.pixel_shuffle(c("upsample.0", feat), 2)
    out = c("conv_last", feat) + F.interpolate(mean.expand(b, 3, 1, 1),
                                               size=(1, 1)) * 0
    out = out + mean
    return out[:, :, :h0 * SCALE, :w0 * SCALE]


@pytest.fixture(scope="module")
def sd():
    return make_state_dict()


@pytest.fixture(scope="module")
def model():
    return SwinIR(scale=SCALE, embed_dim=DIM, depths=DEPTHS,
                  num_heads=HEADS, window_size=WIN, num_feat=NF)


@pytest.mark.parametrize("shape", [(8, 8), (7, 6), (16, 16)])
def test_swinir_matches_oracle(sd, model, shape):
    # (16, 16) gives 4 windows → exercises the PAIRED attention path
    # (window pairs fused into 128-token pseudo-windows) against the
    # torch oracle, including a shifted block
    params = convert_swinir_state_dict(sd, depths=DEPTHS)
    x = np.random.default_rng(0).random((1, *shape, 3)).astype(np.float32)
    want = oracle(sd, torch.from_numpy(x).permute(0, 3, 1, 2)
                  ).permute(0, 2, 3, 1).detach().numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_swinir_paired_attention_exact(sd, model):
    """Window pairing is a pure MXU-shape transform: cross-window
    softmax weights are exactly 0.0, so the paired forward sums the
    SAME real terms as the unpaired one. The backend's matmul
    K-blocking may re-associate them (≤1 ulp per op, compounding to
    2 ulp observed through this 4-block model on CPU), so the pin is
    a few fp32 ulp, not bit equality."""
    import s2sr_tpu.models.swinir as sw

    params = convert_swinir_state_dict(sd, depths=DEPTHS)
    x = jnp.asarray(
        np.random.default_rng(3).random((1, 16, 24, 3)), jnp.float32)
    got = np.asarray(model.apply(params, x))          # paired (6 windows)
    assert sw.WINDOW_GROUP == 2
    try:
        sw.WINDOW_GROUP = 1
        want = np.asarray(model.apply(params, x))     # unpaired
    finally:
        sw.WINDOW_GROUP = 2
    ulps = np.abs(got.view(np.int32) - want.view(np.int32))
    assert ulps.max() <= 4, f"paired attention drifted: {ulps.max()} ulp"


def test_swinir_init_runs(model):
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 8, 8, 3))
    out = model.apply(params, x)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_shift_mask_device_matches_full():
    """The 4-type device-assembled mask must be bit-identical to the
    full numpy construction for every grid shape class (interior-only,
    single row/col, big grids) — it replaces a 268 MB HLO constant at
    1024² that blew the remote-compile relay's size limit (r4)."""
    from s2sr_tpu.models.swinir import _shift_mask, _shift_mask_device

    for h, w, win in [(16, 16, 8), (8, 8, 8), (8, 24, 8), (40, 16, 8),
                      (64, 64, 8), (12, 12, 4), (4, 20, 4)]:
        full = _shift_mask(h, w, win, win // 2)
        dev = np.asarray(_shift_mask_device(h, w, win, win // 2))
        np.testing.assert_array_equal(dev, full, err_msg=f"{h}x{w} w{win}")


def test_tail_strips_bit_exact():
    """r5: past TAIL_STRIP_AREA the x4 upsample tail runs in haloed row
    strips (the whole-image tail OOMs HBM at 1536² — its 4H×4W×64
    activation lane-pads to 128 ch). The strip windows are clamped
    inside the image, so every kept pixel's receptive field sees
    identical inputs: bit-exact vs the whole tail, any height."""
    import s2sr_tpu.models.swinir as sw

    kw = dict(scale=4, embed_dim=12, depths=(2, 2), num_heads=(2, 2),
              window_size=4, num_feat=8)
    m = sw.SwinIR(**kw)
    p = m.init(jax.random.PRNGKey(0))
    old = sw.TAIL_STRIP
    sw.TAIL_STRIP = 16
    try:
        for h in (40, 41, 23):
            feat = jnp.asarray(
                np.random.default_rng(h).random((1, h, 24, 12)),
                jnp.float32)
            a = np.asarray(m._tail(p, feat))
            b = np.asarray(m._tail_strips(p, feat))
            assert (a == b).all(), np.abs(a - b).max()
    finally:
        sw.TAIL_STRIP = old
