"""Training checkpoint management (orbax).

The reference has no training, so its "checkpointing" is weight-file
caching (SURVEY §5.4). The TPU framework trains, so it carries a real
checkpoint manager: params + opt state + step via orbax, with
keep-policy and resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

from orbax import checkpoint as ocp

from ..utils import setup_logging

logger = setup_logging("s2sr_tpu.checkpoint")


class CheckpointManager:
    """Thin orbax wrapper: save/restore (params, opt_state, step)."""

    def __init__(self, directory: Path | str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )

    def restore(
        self, params_like: Any, opt_state_like: Any,
        step: Optional[int] = None,
    ) -> Tuple[Any, Any, int]:
        """Restore latest (or a specific) step; raises if none exist."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints found")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return restored["params"], restored["opt_state"], step

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
