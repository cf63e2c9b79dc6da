"""Fused-RDB Pallas kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2sr_tpu.models.rrdbnet import RRDBNet, _rdb
from s2sr_tpu.ops.pallas.fused_rdb import TILE, pack_rdb_weights, rdb_pallas


@pytest.fixture(scope="module")
def rdb_params():
    net = RRDBNet(num_feat=64, num_block=1, num_grow_ch=32)
    params = net.init(jax.random.PRNGKey(0))
    return jax.tree.map(lambda a: a[0], params["body"]["rdb1"])


@pytest.mark.parametrize("shape", [
    (1, TILE, TILE),          # exactly one tile
    (2, 100, 90),             # ragged, multi-tile, batch
    (1, 40, 200),             # smaller than a tile in one dim
])
def test_matches_xla_rdb(rdb_params, shape):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((*shape, 64)), jnp.float32)
    want = np.asarray(_rdb(x, rdb_params, jnp.float32))
    packed, b14, b5 = pack_rdb_weights(rdb_params, dtype=jnp.float32)
    got = np.asarray(rdb_pallas(x, packed, b14, b5, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_border_zero_padding_semantics(rdb_params):
    """SAME/zero-pad behaviour at image borders must match exactly —
    the masks that zero out-of-image activations are what guarantee it."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((1, 12, 12, 64)), jnp.float32)
    want = np.asarray(_rdb(x, rdb_params, jnp.float32))
    packed, b14, b5 = pack_rdb_weights(rdb_params, dtype=jnp.float32)
    got = np.asarray(rdb_pallas(x, packed, b14, b5, interpret=True))
    # check the outermost ring specifically
    np.testing.assert_allclose(got[0, 0, :], want[0, 0, :], atol=1e-5)
    np.testing.assert_allclose(got[0, :, -1], want[0, :, -1], atol=1e-5)


# --- v2 (delta formulation, round 2) ------------------------------------

@pytest.mark.parametrize("shape,tile", [
    ((1, 32, 32), 32),        # exactly one tile
    ((2, 70, 50), 32),        # ragged, multi-tile, batch (DMA prefetch path)
    ((1, 40, 200), 32),       # wide
])
def test_v2_matches_xla_rdb(rdb_params, shape, tile):
    from s2sr_tpu.ops.pallas.fused_rdb import pack_rdb_weights_v2, rdb_pallas_v2

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((*shape, 64)), jnp.float32)
    want = np.asarray(_rdb(x, rdb_params, jnp.float32))
    packed, b14, b5 = pack_rdb_weights_v2(rdb_params, dtype=jnp.float32)
    got = np.asarray(rdb_pallas_v2(x, packed, b14, b5, interpret=True,
                                   tile=tile))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_v2_border_zero_padding_semantics(rdb_params):
    from s2sr_tpu.ops.pallas.fused_rdb import pack_rdb_weights_v2, rdb_pallas_v2

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((1, 12, 12, 64)), jnp.float32)
    want = np.asarray(_rdb(x, rdb_params, jnp.float32))
    packed, b14, b5 = pack_rdb_weights_v2(rdb_params, dtype=jnp.float32)
    got = np.asarray(rdb_pallas_v2(x, packed, b14, b5, interpret=True,
                                   tile=32))
    np.testing.assert_allclose(got, want, atol=1e-5)


# --- v4 (round-3 structure: ref accumulator, border-only masks) ---------

@pytest.mark.parametrize("shape,tile,taps", [
    ((1, 32, 32), 32, 3),     # single tile, border tile == whole image
    ((2, 70, 50), 32, 3),     # ragged multi-tile + batch
    ((1, 40, 200), 32, 3),    # wide
    ((2, 70, 50), 32, 9),     # 9-tap staging variant
])
def test_v4_matches_xla_rdb(rdb_params, shape, tile, taps):
    from s2sr_tpu.ops.pallas.fused_rdb import (pack_rdb_weights_v2,
                                               pack_rdb_weights_v3)
    from s2sr_tpu.ops.pallas.fused_rdb_v4 import rdb_pallas_v4

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((*shape, 64)), jnp.float32)
    want = np.asarray(_rdb(x, rdb_params, jnp.float32))
    packed, b14, b5 = pack_rdb_weights_v2(rdb_params, dtype=jnp.float32)
    if taps == 9:
        packed9, _, _ = pack_rdb_weights_v3(rdb_params, dtype=jnp.float32)
        packed = (packed[0],) + tuple(packed9[1:])
    got = np.asarray(rdb_pallas_v4(x, packed, b14, b5, interpret=True,
                                   tile=tile, stage_taps=taps))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_v4_border_zero_padding_semantics(rdb_params):
    """The border-only mask path must reproduce zero-pad SAME exactly on
    edge tiles (interior tiles skip masking entirely)."""
    from s2sr_tpu.ops.pallas.fused_rdb import pack_rdb_weights_v2
    from s2sr_tpu.ops.pallas.fused_rdb_v4 import rdb_pallas_v4

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((1, 12, 12, 64)), jnp.float32)
    want = np.asarray(_rdb(x, rdb_params, jnp.float32))
    packed, b14, b5 = pack_rdb_weights_v2(rdb_params, dtype=jnp.float32)
    got = np.asarray(rdb_pallas_v4(x, packed, b14, b5, interpret=True,
                                   tile=32))
    np.testing.assert_allclose(got, want, atol=1e-5)
