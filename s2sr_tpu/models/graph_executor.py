"""Direct numpy execution of frozen TF GraphDefs — converter validator.

VERDICT r2 #4: the EDSR/ESPCN/LapSRN ``.pb`` converters
(:mod:`.pb_reader`) map constants onto :mod:`.classic` parameter trees
*structurally*; a systematic misread of node ordering would survive
shape checks. This module closes the loop without TensorFlow or
network: it walks the parsed NodeDefs (``read_graphdef_nodes``) and
evaluates the graph node-for-node in numpy with TF's documented
semantics, so ``classic.py`` output can be asserted equal to direct
graph execution on the same file.

The op set is exactly what the released graphs use
(Saafke/EDSR_Tensorflow, fannymonori/TF-ESPCN, fannymonori/TF-LAPSRN —
consumed by ``cv2.dnn_superres`` in the reference,
``server/app/super_resolution.py:61-89``): Conv2D, Conv2DBackpropInput,
BiasAdd, Relu/LeakyRelu/Tanh, Add, Sub, Mul, Maximum, DepthToSpace,
Placeholder, Const, Identity. Semantics cross-checked against
``cv2.dnn.readNetFromTensorflow`` (the reference's actual engine) in
``tests/test_graph_executor.py``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from .pb_reader import read_graphdef_nodes


def _same_pads(in_size: int, stride: int, k: int) -> tuple:
    """TF SAME padding: (pad_begin, pad_end) for one spatial dim."""
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    return total // 2, total - total // 2


def conv2d(x: np.ndarray, w: np.ndarray, strides=(1, 1),
           padding: str = "SAME") -> np.ndarray:
    """TF Conv2D: NHWC × HWIO cross-correlation."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    sh, sw = strides
    if padding == "SAME":
        (pt, pb), (pl, pr) = _same_pads(h, sh, kh), _same_pads(wd, sw, kw)
    else:
        (pt, pb), (pl, pr) = (0, 0), (0, 0)
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    oh = (xp.shape[1] - kh) // sh + 1
    ow = (xp.shape[2] - kw) // sw + 1
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + oh * sh:sh, j:j + ow * sw:sw, :]
            out += np.einsum("nhwc,co->nhwo", patch, w[i, j],
                             dtype=np.float32)
    return out


def conv2d_backprop_input(out_shape, w: np.ndarray, y: np.ndarray,
                          strides=(2, 2),
                          padding: str = "SAME") -> np.ndarray:
    """TF Conv2DBackpropInput (a.k.a. transposed conv).

    ``w`` is the FORWARD conv's (kh, kw, in=result channels, out=y
    channels) kernel; the result X satisfies
    ``X_grad[a·s + i − pad_top] += W[i, j, :, k] · Y[a, b, k]`` — the
    exact adjoint of :func:`conv2d`.
    """
    n, oh, ow, cout = y.shape
    kh, kw, cin, _ = w.shape
    sh, sw = strides
    H, W = int(out_shape[1]), int(out_shape[2])
    if padding == "SAME":
        (pt, _), (pl, _) = _same_pads(H, sh, kh), _same_pads(W, sw, kw)
    else:
        pt = pl = 0
    xg = np.zeros((n, H + kh, W + kw, cin), np.float32)  # slack, crop later
    contrib = np.einsum("nhwk,ijck->nhwijc", y, w, dtype=np.float32)
    for i in range(kh):
        for j in range(kw):
            xg[:, i:i + oh * sh:sh, j:j + ow * sw:sw, :] += contrib[:, :, :, i, j, :]
    return xg[:, pt:pt + H, pl:pl + W, :]


def depth_to_space(x: np.ndarray, block: int) -> np.ndarray:
    """TF NHWC DepthToSpace: depth index = (dy·block + dx)·C + c."""
    n, h, w, cf = x.shape
    c = cf // (block * block)
    x = x.reshape(n, h, w, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, c)


def execute_graphdef(path: Path | str, feed: Dict[str, np.ndarray],
                     output: str | None = None) -> np.ndarray:
    """Evaluate a frozen GraphDef in numpy. ``feed`` maps Placeholder
    names to NHWC float arrays; ``output`` defaults to the last node."""
    nodes = read_graphdef_nodes(path)
    by_name = {n["name"]: n for n in nodes}
    if output is None:
        output = nodes[-1]["name"]
    memo: Dict[str, np.ndarray] = {}

    def ev(name: str) -> np.ndarray:
        if name in memo:
            return memo[name]
        node = by_name[name]
        op = node["op"]
        ins = node["inputs"]
        a = node["attrs"]
        if op == "Placeholder":
            val = np.asarray(feed[name], np.float32)
        elif op == "Const":
            val = a["value"]
        elif op in ("Identity", "StopGradient"):
            val = ev(ins[0])
        elif op == "Conv2D":
            strides = a.get("strides", [1, 1, 1, 1])
            val = conv2d(ev(ins[0]), ev(ins[1]),
                         (strides[1], strides[2]),
                         a.get("padding", "SAME"))
        elif op == "Conv2DBackpropInput":
            strides = a.get("strides", [1, 1, 1, 1])
            val = conv2d_backprop_input(
                ev(ins[0]).astype(np.int64), ev(ins[1]), ev(ins[2]),
                (strides[1], strides[2]), a.get("padding", "SAME"))
        elif op == "BiasAdd":
            val = ev(ins[0]) + ev(ins[1])
        elif op in ("Add", "AddV2"):
            val = ev(ins[0]) + ev(ins[1])
        elif op == "Sub":
            val = ev(ins[0]) - ev(ins[1])
        elif op == "Mul":
            val = ev(ins[0]) * ev(ins[1])
        elif op == "Maximum":
            val = np.maximum(ev(ins[0]), ev(ins[1]))
        elif op == "Relu":
            val = np.maximum(ev(ins[0]), 0)
        elif op == "LeakyRelu":
            alpha = a.get("alpha", 0.2)
            v = ev(ins[0])
            val = np.where(v > 0, v, alpha * v)
        elif op == "Tanh":
            val = np.tanh(ev(ins[0]))
        elif op == "DepthToSpace":
            val = depth_to_space(ev(ins[0]), int(a["block_size"]))
        else:
            raise NotImplementedError(f"op {op} (node {name})")
        memo[name] = np.asarray(val)
        return memo[name]

    return ev(output)
