"""TensorFlow GraphDef (.pb) weight extraction — no TensorFlow needed.

The reference's EDSR/ESPCN/LapSRN models ship as frozen TF GraphDefs
consumed by ``cv2.dnn_superres`` (``server/app/super_resolution.py:61-89``).
TensorFlow is not in this image, so this module walks the protobuf wire
format directly (GraphDef → NodeDef → AttrValue → TensorProto) and
pulls every Const tensor out, then maps them onto the classic-model
parameter trees by shape signature.

Wire-format subset handled: varint, 64-bit, length-delimited fields;
TensorProto payloads via ``tensor_content`` bytes or repeated
``float_val``/``int_val``.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

# TF DataType enum values we support
_DTYPES = {1: np.float32, 2: np.float64, 3: np.int32, 9: np.int64}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _walk(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) for a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:          # varint
            value, pos = _read_varint(buf, pos)
            yield field, wire, value
        elif wire == 1:        # 64-bit
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        elif wire == 2:        # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos:pos + length]
            pos += length
        elif wire == 5:        # 32-bit
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf: bytes) -> Optional[np.ndarray]:
    """TensorProto → ndarray (None if dtype unsupported)."""
    dtype = None
    shape: List[int] = []
    content = b""
    float_vals: List[float] = []
    int_vals: List[int] = []
    for field, wire, value in _walk(buf):
        if field == 1 and wire == 0:                   # dtype
            dtype = _DTYPES.get(value)
            if dtype is None:
                return None
        elif field == 2 and wire == 2:                 # tensor_shape
            for f2, w2, v2 in _walk(value):
                if f2 == 2 and w2 == 2:                # dim
                    for f3, w3, v3 in _walk(v2):
                        if f3 == 1 and w3 == 0:        # size
                            shape.append(v3)
        elif field == 4 and wire == 2:                 # tensor_content
            content = value
        elif field == 5:                               # float_val
            if wire == 5:
                float_vals.append(struct.unpack("<f", value)[0])
            elif wire == 2:                            # packed
                float_vals.extend(np.frombuffer(value, "<f4").tolist())
        elif field == 3 and wire == 0:                 # version? skip
            pass
        elif field in (6, 7) and wire in (0, 2):       # double/int vals
            if wire == 0:
                int_vals.append(value)
    if dtype is None:
        return None
    if content:
        arr = np.frombuffer(content, dtype=np.dtype(dtype).newbyteorder("<"))
    elif float_vals:
        arr = np.asarray(float_vals, dtype)
    elif int_vals:
        arr = np.asarray(int_vals, dtype)
    else:
        arr = np.zeros(0, dtype)
    if shape:
        total = int(np.prod(shape))
        if arr.size == 1 and total > 1:
            arr = np.full(total, arr[0], dtype)
        arr = arr[:total].reshape(shape)
    return arr.astype(dtype)


def read_graphdef_constants(path: Path | str) -> Dict[str, np.ndarray]:
    """name → tensor for every Const node in a frozen GraphDef."""
    buf = Path(path).read_bytes()
    constants: Dict[str, np.ndarray] = {}
    for field, wire, node_buf in _walk(buf):
        if field != 1 or wire != 2:
            continue
        name = op = None
        tensor = None
        for f, w, v in _walk(node_buf):
            if f == 1 and w == 2:
                name = v.decode("utf-8", "replace")
            elif f == 2 and w == 2:
                op = v.decode("utf-8", "replace")
            elif f == 5 and w == 2:                    # attr map entry
                key = None
                attr_buf = None
                for f2, w2, v2 in _walk(v):
                    if f2 == 1 and w2 == 2:
                        key = v2.decode("utf-8", "replace")
                    elif f2 == 2 and w2 == 2:
                        attr_buf = v2
                if key == "value" and attr_buf is not None:
                    for f3, w3, v3 in _walk(attr_buf):
                        if f3 == 8 and w3 == 2:        # tensor
                            tensor = _parse_tensor(v3)
        if op == "Const" and name and tensor is not None:
            constants[name] = tensor
    return constants


def convert_espcn_pb(path: Path | str, scale: int) -> dict:
    """Frozen ESPCN .pb → our param tree, matched by kernel shapes.

    ESPCN's three convs are unambiguous by shape: 5×5×C→64, 3×3×64→32,
    3×3×32→(C·s²). TF kernels are already HWIO — no transpose needed.
    """
    import jax.numpy as jnp

    constants = read_graphdef_constants(path)
    kernels = sorted(
        [t for t in constants.values() if t.ndim == 4],
        key=lambda t: -t.shape[0])
    biases = [t for t in constants.values() if t.ndim == 1]
    if len(kernels) < 3:
        raise ValueError(f"expected ≥3 conv kernels in {path}, "
                         f"found {len(kernels)}")

    def bias_for(kernel):
        for b in biases:
            if b.shape[0] == kernel.shape[3]:
                return b
        return np.zeros(kernel.shape[3], np.float32)

    names = ("conv1", "conv2", "conv3")
    params = {}
    for name, kernel in zip(names, kernels[:3]):
        params[name] = {"kernel": jnp.asarray(kernel),
                        "bias": jnp.asarray(bias_for(kernel))}
    return params
