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
