"""RRDBNet numerical parity vs an independent torch-functional oracle.

The oracle reimplements the published Real-ESRGAN generator math directly
with ``torch.nn.functional`` from a flat state dict (the same tensor
names the released checkpoints use), so agreement checks both the
architecture and the OIHW→HWIO/stacked-body weight conversion.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2sr_tpu.models.rrdbnet import RRDBNet, rrdbnet_apply, _nearest_x2
from s2sr_tpu.models.weights import (
    convert_rrdbnet_state_dict,
    load_params,
    resolve_params,
    save_params,
)

NF, GC, NB = 32, 16, 2  # small test config


def make_state_dict(seed: int = 0, nf: int = NF, gc: int = GC, nb: int = NB):
    g = torch.Generator().manual_seed(seed)

    def conv(cin, cout):
        return (torch.randn(cout, cin, 3, 3, generator=g) * 0.05,
                torch.randn(cout, generator=g) * 0.05)

    sd = {}

    def put(name, cin, cout):
        w, b = conv(cin, cout)
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = b

    put("conv_first", 3, nf)
    for i in range(nb):
        for j in (1, 2, 3):
            for k in (1, 2, 3, 4, 5):
                cin = nf + (k - 1) * gc if k < 5 else nf + 4 * gc
                cout = gc if k < 5 else nf
                put(f"body.{i}.rdb{j}.conv{k}", cin, cout)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        put(name, nf, nf)
    put("conv_last", nf, 3)
    return sd


def oracle_forward(sd, x: torch.Tensor, nb: int = NB, scale: int = 4) -> torch.Tensor:
    """Flat functional evaluation of the published generator equations."""
    def c(name, t):
        return F.conv2d(t, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=1)

    def lrelu(t):
        return F.leaky_relu(t, 0.2)

    def rdb(name, t):
        x1 = lrelu(c(f"{name}.conv1", t))
        x2 = lrelu(c(f"{name}.conv2", torch.cat([t, x1], 1)))
        x3 = lrelu(c(f"{name}.conv3", torch.cat([t, x1, x2], 1)))
        x4 = lrelu(c(f"{name}.conv4", torch.cat([t, x1, x2, x3], 1)))
        x5 = c(f"{name}.conv5", torch.cat([t, x1, x2, x3, x4], 1))
        return x5 * 0.2 + t

    feat = c("conv_first", x)
    body = feat
    for i in range(nb):
        block_in = body
        for j in (1, 2, 3):
            block_in = rdb(f"body.{i}.rdb{j}", block_in)
        body = block_in * 0.2 + body
    feat = feat + c("conv_body", body)
    feat = lrelu(c("conv_up1", F.interpolate(feat, scale_factor=2, mode="nearest")))
    if scale == 4:
        feat = lrelu(c("conv_up2", F.interpolate(feat, scale_factor=2, mode="nearest")))
    feat = lrelu(c("conv_hr", feat))
    return c("conv_last", feat)


@pytest.fixture(scope="module")
def state_dict():
    return make_state_dict()


@pytest.fixture(scope="module")
def jax_params(state_dict):
    return convert_rrdbnet_state_dict(state_dict)


class TestParity:
    @pytest.mark.parametrize("scale", [2, 4])
    def test_forward_matches_oracle(self, state_dict, jax_params, scale):
        x = np.random.default_rng(3).random((1, 24, 20, 3)).astype(np.float32)
        want = oracle_forward(
            state_dict, torch.from_numpy(x).permute(0, 3, 1, 2), scale=scale
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(
            rrdbnet_apply(jax_params, jnp.asarray(x), scale=scale,
                          dtype=jnp.float32)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_bf16_close_to_fp32(self, jax_params):
        x = jnp.asarray(
            np.random.default_rng(4).random((1, 16, 16, 3)).astype(np.float32)
        )
        full = rrdbnet_apply(jax_params, x, dtype=jnp.float32)
        half = rrdbnet_apply(jax_params, x, dtype=jnp.bfloat16)
        # bf16 error budget: well under 1/255 (one uint8 level) rms
        rms = float(jnp.sqrt(jnp.mean((full - half) ** 2)))
        assert rms < 1.0 / 255.0

    def test_nearest_upsample_matches_torch(self):
        x = np.random.default_rng(5).random((2, 5, 7, 3)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(_nearest_x2(jnp.asarray(x)))
        np.testing.assert_array_equal(got, want)


class TestWeights:
    def test_params_ema_unwrap(self, state_dict):
        wrapped = {"params_ema": state_dict}
        p = convert_rrdbnet_state_dict(wrapped)
        assert "conv_first" in p and "body" in p

    def test_save_load_roundtrip(self, jax_params, tmp_path):
        path = save_params(jax_params, tmp_path / "w.npz")
        back = load_params(path)
        for a, b in zip(jax.tree.leaves(jax_params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_init_shapes_match_converted(self, jax_params):
        net = RRDBNet(num_feat=NF, num_block=NB, num_grow_ch=GC)
        init = net.init(jax.random.PRNGKey(0))
        want = jax.tree.map(lambda a: a.shape, jax_params)
        got = jax.tree.map(lambda a: a.shape, init)
        assert want == got

    def test_resolve_params_random_fallback(self, tmp_path):
        params, pretrained = resolve_params("realesrgan_anime", tmp_path)
        assert not pretrained
        assert params["body"]["rdb1"]["conv1"]["kernel"].shape == (6, 3, 3, 64, 32)

    def test_resolve_params_from_pth(self, state_dict, tmp_path):
        # emulate a downloaded checkpoint for the anime config shape-free path
        torch.save({"params_ema": state_dict}, tmp_path / "custom.pth")
        from s2sr_tpu.models.weights import convert_checkpoint

        out = convert_checkpoint(tmp_path / "custom.pth", tmp_path / "custom.npz")
        p = load_params(out)
        assert p["body"]["rdb1"]["conv1"]["kernel"].shape == (NB, 3, 3, NF, GC)


def test_packed_rdb_bit_identical():
    """The packed-accumulator RDB must stay bit-identical to the lazy
    delta form in fp32 AND bf16 (it reorders memory, never arithmetic)."""
    import jax
    import jax.numpy as jnp

    from s2sr_tpu.models.rrdbnet import RRDBNet, _rdb, _rdb_packed

    net = RRDBNet(num_feat=64, num_block=1, num_grow_ch=32)
    params = net.init(jax.random.PRNGKey(0))
    p = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.random((2, 24, 40, 64)), jnp.float32)
    for dtype in (jnp.float32, jnp.bfloat16):
        a = np.asarray(_rdb(xs.astype(dtype), p, dtype).astype(jnp.float32))
        b = np.asarray(
            _rdb_packed(xs.astype(dtype), p, dtype).astype(jnp.float32))
        np.testing.assert_array_equal(a, b)


def test_up_sub_batch_identical():
    """Sub-batched upsample tail must be byte-identical to monolithic
    (it only reorders memory residency, never math)."""
    import jax
    import jax.numpy as jnp

    from s2sr_tpu.models.rrdbnet import RRDBNet, rrdbnet_apply

    net = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    a = np.asarray(rrdbnet_apply(params, x, dtype=jnp.float32))
    b = np.asarray(rrdbnet_apply(params, x, dtype=jnp.float32,
                                 up_sub_batch=2))
    np.testing.assert_array_equal(a, b)
    # non-dividing / oversized sub-batch falls back to monolithic
    c = np.asarray(rrdbnet_apply(params, x, dtype=jnp.float32,
                                 up_sub_batch=3))
    np.testing.assert_array_equal(a, c)
