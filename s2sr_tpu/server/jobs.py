"""Job store + device-owning job runner.

The reference keeps jobs in a bare module-level dict mutated from
handler threads with no locks, and chains queued enhance jobs through
raw daemon threads (``server/app/main.py:34,63-70,655-675`` — flagged as
a hazard in SURVEY §5.2). Here:

- :class:`JobStore` — the same observable status-dict shape (clients
  poll it verbatim), but lock-guarded,
- :class:`JobRunner` — a single worker thread that owns the TPU device;
  FIFO submission gives exactly the reference's semantics
  (``MAX_CONCURRENT_ENHANCE=1`` + pending queue) without daemon-thread
  chaining. ``active_count``/``queued`` expose capacity so the enhance
  endpoint can report "queued due to concurrency limits".
"""

from __future__ import annotations

import queue
import threading
import traceback
from datetime import datetime
from typing import Any, Callable, Dict, Optional

from ..utils import setup_logging

logger = setup_logging("s2sr_tpu.jobs")


class JobStore:
    def __init__(self) -> None:
        self._jobs: Dict[str, dict] = {}
        self._lock = threading.Lock()

    def create(self, job_id: str, **fields: Any) -> dict:
        with self._lock:
            self._jobs[job_id] = {
                "created_at": datetime.now().isoformat(),
                **fields,
            }
            return dict(self._jobs[job_id])

    def update(self, job_id: str, **fields: Any) -> None:
        with self._lock:
            if job_id in self._jobs:
                self._jobs[job_id].update(fields)

    def get(self, job_id: str) -> Optional[dict]:
        with self._lock:
            job = self._jobs.get(job_id)
            return dict(job) if job is not None else None

    def all(self) -> Dict[str, dict]:
        with self._lock:
            return {k: dict(v) for k, v in self._jobs.items()}

    def with_prefix(self, prefix: str) -> Dict[str, dict]:
        with self._lock:
            return {k: dict(v) for k, v in self._jobs.items()
                    if k.startswith(prefix)}

    def __contains__(self, job_id: str) -> bool:
        with self._lock:
            return job_id in self._jobs


class JobRunner:
    """Single-worker FIFO executor owning the device."""

    def __init__(self, store: JobStore, max_concurrent: int = 1) -> None:
        self.store = store
        self.max_concurrent = max(1, max_concurrent)
        self._queue: "queue.Queue[tuple[str, Callable[[], None]]]" = queue.Queue()
        self._active: set[str] = set()
        self._lock = threading.Lock()
        self._workers = [
            threading.Thread(target=self._worker, daemon=True,
                             name=f"s2sr-job-worker-{i}")
            for i in range(self.max_concurrent)
        ]
        for w in self._workers:
            w.start()

    def _worker(self) -> None:
        while True:
            job_id, fn = self._queue.get()
            with self._lock:
                self._active.add(job_id)
            try:
                fn()
            except Exception as exc:  # job fns set their own status; belt+braces
                logger.error("job %s crashed: %s\n%s", job_id, exc,
                             traceback.format_exc())
                self.store.update(job_id, status="failed", message=str(exc))
            finally:
                with self._lock:
                    self._active.discard(job_id)
                self._queue.task_done()

    @property
    def active_count(self) -> int:
        with self._lock:
            return len(self._active)

    @property
    def queued_count(self) -> int:
        return self._queue.qsize()

    def has_capacity(self) -> bool:
        return self.active_count + self.queued_count < self.max_concurrent

    def submit(self, job_id: str, fn: Callable[[], None]) -> None:
        self._queue.put((job_id, fn))

    def join(self, timeout: Optional[float] = None) -> None:
        """Testing helper: wait until the queue drains."""
        import time

        deadline = None if timeout is None else time.time() + timeout
        while self._queue.unfinished_tasks:
            if deadline is not None and time.time() > deadline:
                raise TimeoutError("jobs did not finish in time")
            time.sleep(0.02)
