"""On-hardware numerics evidence (VERDICT r1 weak #8).

Runs the full RRDBNet-23 forward on the real TPU (bf16 and fp32) and
compares against the CPU fp32 oracle of the same JAX code, plus the
uint8-quantised serving contract. Records per-run evidence for
BENCH_NOTES so kernel/formulation changes land with on-chip numbers,
not CPU-only claims.

Usage: python scripts/tpu_parity.py  (needs the TPU visible; CPU oracle
is computed in-process via a device transfer)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from s2sr_tpu.models.rrdbnet import RRDBNet, rrdbnet_apply

    if jax.default_backend() == "cpu":
        print("# WARNING: no TPU visible; this run proves nothing",
              file=sys.stderr)

    net = RRDBNet()          # full 23-block flagship
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(42)
    x_np = rng.random((1, 132, 132, 3)).astype(np.float32)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_cpu = jax.device_put(params, cpu)
        want = np.asarray(rrdbnet_apply(params_cpu, jnp.asarray(x_np),
                                        dtype=jnp.float32))

    x = jnp.asarray(x_np)
    got32 = np.asarray(rrdbnet_apply(params, x, dtype=jnp.float32))
    gotbf = np.asarray(rrdbnet_apply(params, x, dtype=jnp.bfloat16))

    def u8(a):
        return np.trunc(np.clip(a * 255.0, 0, 255)).astype(np.uint8)

    d32 = float(np.abs(got32 - want).max())
    dbf = float(np.abs(gotbf - want).max())
    u8_mismatch32 = float((u8(got32) != u8(want)).mean())
    lsb_bf = int(np.abs(u8(gotbf).astype(int) - u8(want).astype(int)).max())
    print(json.dumps({
        "backend": jax.default_backend(),
        "model": "RRDBNet-23 x4 (random init, seed 0)",
        "fp32_max_abs_vs_cpu": d32,
        "bf16_max_abs_vs_cpu_fp32": dbf,
        "fp32_uint8_mismatch_frac": u8_mismatch32,
        "bf16_uint8_max_lsb": lsb_bf,
    }), flush=True)

    # --- SwinIR: the fused Pallas block kernel's MOSAIC lowering vs
    # the CPU fp32 XLA oracle (the interpret-mode tests pin interpret
    # semantics only — this is the on-chip evidence, r5) -------------
    from s2sr_tpu.models import swinir as sw

    model = sw.SwinIR(dtype=jnp.float32)
    sp = model.init(jax.random.PRNGKey(1))
    xs_np = rng.random((1, 256, 256, 3)).astype(np.float32)
    with jax.default_device(cpu):
        sp_cpu = jax.device_put(sp, cpu)
        sw.FUSED_ATTN = "0"
        m_cpu = sw.SwinIR(dtype=jnp.float32)
        want_s = np.asarray(m_cpu.apply(sp_cpu, jnp.asarray(xs_np)))
    # control FIRST: XLA fp32 on TPU vs the CPU oracle — random-init
    # 36-block propagation amplifies platform fp32 differences (TPU
    # f32 matmul internals, excess-precision flags) to ~0.17; the
    # fused kernel must sit AT this floor, not above it
    ctrl = np.asarray(sw.SwinIR(dtype=jnp.float32)
                      .apply(sp, jnp.asarray(xs_np)))
    sw.FUSED_ATTN = "1"
    got_f32 = np.asarray(sw.SwinIR(dtype=jnp.float32)
                         .apply(sp, jnp.asarray(xs_np)))
    got_bf = np.asarray(sw.SwinIR(dtype=jnp.bfloat16)
                        .apply(sp, jnp.asarray(xs_np)))
    sw.FUSED_ATTN = "auto"
    print(json.dumps({
        "model": "SwinIR-M x4 fused block kernel (random init)",
        "control_xla_fp32_tpu_vs_cpu": float(
            np.abs(ctrl - want_s).max()),
        "fused_fp32_max_abs_vs_cpu_xla": float(
            np.abs(got_f32 - want_s).max()),
        "fused_fp32_vs_xla_fp32_on_tpu": float(
            np.abs(got_f32 - ctrl).max()),
        "fused_bf16_max_abs_vs_cpu_fp32": float(
            np.abs(got_bf - want_s).max()),
        "fused_bf16_uint8_max_lsb": int(np.abs(
            u8(got_bf).astype(int) - u8(want_s).astype(int)).max()),
    }), flush=True)


if __name__ == "__main__":
    main()
