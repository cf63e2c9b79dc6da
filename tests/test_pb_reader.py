"""GraphDef wire-format reader tests (hand-encoded protobuf bytes)."""

import struct

import numpy as np
import pytest


def varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def field(num: int, wire: int, payload: bytes | int) -> bytes:
    key = varint((num << 3) | wire)
    if wire == 0:
        return key + varint(payload)
    if wire == 2:
        return key + varint(len(payload)) + payload
    if wire == 5:
        return key + payload
    raise ValueError(wire)


def tensor_proto(arr: np.ndarray) -> bytes:
    shape = b"".join(
        field(2, 2, field(1, 0, s)) for s in arr.shape)  # dims
    return (field(1, 0, 1)                                # dtype float32
            + field(2, 2, shape)
            + field(4, 2, arr.astype("<f4").tobytes()))


def const_node(name: str, arr: np.ndarray) -> bytes:
    attr_value = field(8, 2, tensor_proto(arr))           # AttrValue.tensor
    attr_entry = field(1, 2, b"value") + field(2, 2, attr_value)
    node = (field(1, 2, name.encode())
            + field(2, 2, b"Const")
            + field(5, 2, attr_entry))
    return field(1, 2, node)                              # GraphDef.node


def test_read_constants(tmp_path, rng):
    from s2sr_tpu.models.pb_reader import read_graphdef_constants

    a = rng.random((5, 5, 3, 64)).astype(np.float32)
    b = rng.random((64,)).astype(np.float32)
    graph = const_node("w1", a) + const_node("b1", b)
    # plus a non-const node that must be ignored
    other = field(1, 2, field(1, 2, b"relu") + field(2, 2, b"Relu"))
    p = tmp_path / "g.pb"
    p.write_bytes(graph + other)
    constants = read_graphdef_constants(p)
    assert set(constants) == {"w1", "b1"}
    np.testing.assert_allclose(constants["w1"], a)
    np.testing.assert_allclose(constants["b1"], b)


def test_convert_espcn_pb_runs_model(tmp_path, rng):
    from s2sr_tpu.models.classic import ESPCN
    from s2sr_tpu.models.pb_reader import convert_espcn_pb
    import jax.numpy as jnp

    scale = 3
    k1 = rng.random((5, 5, 3, 64)).astype(np.float32) * 0.1
    k2 = rng.random((3, 3, 64, 32)).astype(np.float32) * 0.1
    k3 = rng.random((3, 3, 32, 3 * scale * scale)).astype(np.float32) * 0.1
    b1 = rng.random((64,)).astype(np.float32)
    b2 = rng.random((32,)).astype(np.float32)
    b3 = rng.random((3 * scale * scale,)).astype(np.float32)
    graph = b"".join(const_node(n, t) for n, t in
                     [("w1", k1), ("w2", k2), ("w3", k3),
                      ("b1", b1), ("b2", b2), ("b3", b3)])
    p = tmp_path / "espcn_x3.pb"
    p.write_bytes(graph)
    params = convert_espcn_pb(p, scale)
    assert params["conv1"]["kernel"].shape == (5, 5, 3, 64)
    assert params["conv3"]["kernel"].shape == (3, 3, 32, 27)
    model = ESPCN(scale=scale)
    out = model.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 24, 24, 3)


def _edsr_graph(rng, feat=16, blocks=2, scale=2):
    """Synthetic frozen-EDSR GraphDef in forward construction order."""
    parts = [const_node("mean", np.array([114.4, 111.5, 103.0], np.float32))]

    def conv(name, kh, cin, cout):
        k = (rng.random((kh, kh, cin, cout)).astype(np.float32) - 0.5) * 0.05
        b = rng.random((cout,)).astype(np.float32) * 0.01
        parts.append(const_node(f"{name}/w", k))
        parts.append(const_node(f"{name}/b", b))

    conv("head", 3, 3, feat)
    for i in range(blocks):
        conv(f"block{i}/c1", 3, feat, feat)
        conv(f"block{i}/c2", 3, feat, feat)
    conv("body", 3, feat, feat)
    conv("up1", 3, feat, feat * scale * scale)
    conv("tail", 3, feat, 3)
    return b"".join(parts)


def test_convert_edsr_pb_runs_model(tmp_path, rng):
    import jax.numpy as jnp

    from s2sr_tpu.models.classic import EDSR
    from s2sr_tpu.models.pb_reader import convert_edsr_pb

    p = tmp_path / "edsr_x2.pb"
    p.write_bytes(_edsr_graph(rng, feat=16, blocks=2, scale=2))
    params, config = convert_edsr_pb(p, 2)
    assert config["channels"] == 16 and config["blocks"] == 2
    assert config["mean"].shape == (3,)
    assert params["body"]["conv1"]["kernel"].shape == (2, 3, 3, 16, 16)
    model = EDSR(scale=2, num_feat=16, num_blocks=2)
    out = model.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)


def test_convert_edsr_pb_audits_bad_graph(tmp_path, rng):
    from s2sr_tpu.models.pb_reader import convert_edsr_pb

    k = rng.random((3, 3, 7, 7)).astype(np.float32)
    p = tmp_path / "bad.pb"
    p.write_bytes(const_node("w", k))
    with pytest.raises(ValueError, match="head"):
        convert_edsr_pb(p, 2)


def _lapsrn_graph(rng, feat=8, depth=3, levels=2):
    parts = []

    def conv(name, kh, cin, cout):
        k = (rng.random((kh, kh, cin, cout)).astype(np.float32) - 0.5) * 0.05
        b = rng.random((cout,)).astype(np.float32) * 0.01
        parts.append(const_node(f"{name}/w", k))
        parts.append(const_node(f"{name}/b", b))

    conv("head", 3, 3, feat)
    for lv in range(levels):
        for d in range(depth):
            conv(f"l{lv}/e{d}", 3, feat, feat)
        # transposed convs: TF stores (kh, kw, out, in), no bias
        parts.append(const_node(
            f"l{lv}/upf",
            rng.random((4, 4, feat, feat)).astype(np.float32) * 0.05))
        conv(f"l{lv}/res", 3, feat, 3)
        parts.append(const_node(
            f"l{lv}/upi", rng.random((4, 4, 3, 3)).astype(np.float32) * 0.05))
    return b"".join(parts)


def test_convert_lapsrn_pb_runs_model(tmp_path, rng):
    import jax.numpy as jnp

    from s2sr_tpu.models.classic import LapSRN
    from s2sr_tpu.models.pb_reader import convert_lapsrn_pb

    p = tmp_path / "lapsrn_x4.pb"
    p.write_bytes(_lapsrn_graph(rng, feat=8, depth=3, levels=2))
    params = convert_lapsrn_pb(p, 4)
    assert len(params["levels"]) == 2
    assert len(params["levels"][0]["embed"]) == 3
    model = LapSRN(scale=4, num_feat=8)
    out = model.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)


def test_convert_lapsrn_weight_sharing_x8(tmp_path, rng):
    """x8 graph storing one shared level is replicated to 3 levels."""
    from s2sr_tpu.models.pb_reader import convert_lapsrn_pb

    p = tmp_path / "lapsrn_x8.pb"
    p.write_bytes(_lapsrn_graph(rng, feat=8, depth=2, levels=1))
    params = convert_lapsrn_pb(p, 8)
    assert len(params["levels"]) == 3


def test_create_sr_model_loads_pb(tmp_path, rng, monkeypatch):
    """The serving path picks up a dropped .pb for all three families."""
    import jax.numpy as jnp

    from s2sr_tpu.config import settings as settings_mod

    weights = tmp_path / "weights"
    weights.mkdir()
    (weights / "edsr_x2.pb").write_bytes(_edsr_graph(rng, 16, 2, 2))
    (weights / "lapsrn_x4.pb").write_bytes(_lapsrn_graph(rng, 8, 2, 2))

    from s2sr_tpu.config.settings import Settings

    monkeypatch.setattr(
        "s2sr_tpu.config.get_settings",
        lambda: Settings(weights_dir=str(weights), offline=True))
    from s2sr_tpu.pipelines.super_resolution import create_sr_model

    inst, params = create_sr_model("edsr", 2)
    assert inst.num_feat == 16 and inst.num_blocks == 2
    out = inst.apply(params, jnp.zeros((1, 6, 6, 3)))
    assert out.shape == (1, 12, 12, 3)

    inst, params = create_sr_model("lapsrn", 4)
    out = inst.apply(params, jnp.zeros((1, 6, 6, 3)))
    assert out.shape == (1, 24, 24, 3)


def test_parse_tensor_packed_and_negative_ints(tmp_path):
    """proto3 packs repeated int_val into one wire-2 payload, and
    negative int32 values arrive as 64-bit two's-complement varints —
    both must decode (previously the packed form silently became a
    size-0 array that crashed on reshape)."""
    from s2sr_tpu.models.pb_reader import read_graphdef_constants

    shape4 = field(2, 2, field(1, 0, 4))
    packed = b"".join(varint(v) for v in [1, 300, 7, 2])
    tp = field(1, 0, 3) + field(2, 2, shape4) + field(7, 2, packed)
    ae = field(1, 2, b"value") + field(2, 2, field(8, 2, tp))
    nd = (field(1, 2, b"packed") + field(2, 2, b"Const")
          + field(5, 2, ae))
    parts = field(1, 2, nd)

    shape1 = field(2, 2, field(1, 0, 1))
    tp2 = (field(1, 0, 3) + field(2, 2, shape1)
           + field(7, 0, (1 << 64) - 5))                    # -5
    ae2 = field(1, 2, b"value") + field(2, 2, field(8, 2, tp2))
    nd2 = (field(1, 2, b"neg") + field(2, 2, b"Const")
           + field(5, 2, ae2))
    parts += field(1, 2, nd2)

    # packed doubles (field 6, wire 2)
    dvals = np.array([1.5, -2.25], "<f8")
    tp3 = (field(1, 0, 2) + field(2, 2, field(2, 2, field(1, 0, 2)))
           + field(6, 2, dvals.tobytes()))
    ae3 = field(1, 2, b"value") + field(2, 2, field(8, 2, tp3))
    nd3 = (field(1, 2, b"dbl") + field(2, 2, b"Const")
           + field(5, 2, ae3))
    parts += field(1, 2, nd3)

    p = tmp_path / "packed.pb"
    p.write_bytes(parts)
    consts = read_graphdef_constants(p)
    np.testing.assert_array_equal(consts["packed"], [1, 300, 7, 2])
    np.testing.assert_array_equal(consts["neg"], [-5])
    np.testing.assert_allclose(consts["dbl"], [1.5, -2.25])


def test_create_sr_model_process_cache(tmp_path, monkeypatch):
    """Classic models are cached per (name, weights identity) like
    get_engine — a second request must not re-build/re-trace."""
    from s2sr_tpu.config.settings import Settings

    monkeypatch.setattr(
        "s2sr_tpu.config.get_settings",
        lambda: Settings(weights_dir=str(tmp_path), offline=True))
    from s2sr_tpu.pipelines.super_resolution import create_sr_model

    inst1, params1 = create_sr_model("espcn", 2)
    inst2, params2 = create_sr_model("espcn", 2)
    assert inst1 is inst2 and params1 is params2
