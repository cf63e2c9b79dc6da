"""Driver-contract smoke tests for __graft_entry__.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip`` on a virtual CPU mesh; these tests guard the
import surface and signatures so a refactor of the flagship model or
training API cannot silently break the contract between driver runs.
The heavy multichip legs are covered by the CPU-mesh tests in
test_tiling.py / test_training.py / test_parallel_pp_tp.py; here we
only trace (no compile) to keep this cheap on the 1-core box.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_returns_jittable_forward():
    fn, args = __graft_entry__.entry()
    params, x = args
    assert x.ndim == 4 and x.shape[-1] == 3
    # abstract trace: catches shape/signature/import breaks without the
    # multi-minute 23-block CPU compile
    out = jax.eval_shape(fn, *args)
    assert out.shape == (x.shape[0], x.shape[1] * 4, x.shape[2] * 4, 3)
    assert out.dtype in (jnp.float32, jnp.bfloat16)


def test_dryrun_bootstrap_template_is_wellformed():
    # the subprocess fallback builds source from this template; a bad
    # format key would only fail at driver time — compile it here
    code = __graft_entry__._CHILD_BOOTSTRAP.format(n=8, repo="/tmp/x")
    compile(code, "<bootstrap>", "exec")
