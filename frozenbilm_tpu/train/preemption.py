"""Graceful-preemption checkpointing.

TPU pods (and spot/preemptible slices generally) deliver SIGTERM with a
short grace window before eviction. The reference has no preemption story —
an interrupted main.py loses everything since the last per-epoch save
(main.py:292-300). Here a signal flag is polled at step granularity: the
train loop finishes the in-flight step, saves trainable params + optimizer
state + (epoch, step) metadata into `<save_dir>/checkpoint_preempt`, and
exits cleanly; `--resume --load <save_dir>/checkpoint_preempt` continues.

Kept deliberately signal-async-safe: the handler only sets a flag (no IO,
no JAX calls — both are undefined behavior inside a signal handler while
the main thread is mid-dispatch).
"""

from __future__ import annotations

import os
import signal
import threading
from typing import Optional


class PreemptionGuard:
    """Installs SIGTERM (+ optionally SIGINT) handlers that set a flag.

    Use as a context manager so the previous handlers are restored —
    important under pytest and when drivers are invoked as library calls.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._flag = threading.Event()
        self._prev = {}

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._on_signal)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        return False

    def _on_signal(self, signum, frame):
        self._flag.set()

    @property
    def preempted(self) -> bool:
        return self._flag.is_set()


def save_preempt_checkpoint(save_dir: str, state, *, epoch: int,
                            step: int, fmt: str = "npz",
                            args=None) -> Optional[str]:
    """Write <save_dir>/checkpoint_preempt (trainable + opt state + meta).

    Returns the checkpoint path, or None when save_dir is empty or this is
    not the main process (multi-host: rank 0 saves, like every other save)."""
    from frozenbilm_tpu.parallel.mesh import is_main_process
    from frozenbilm_tpu.utils.checkpoint import save_opt_state, save_params

    if not save_dir or not is_main_process():
        return None
    path = os.path.join(save_dir, "checkpoint_preempt")
    # epoch-1 in meta: the resume convention reads meta['epoch']+1 as
    # start_epoch, and a mid-epoch preempt must re-run the current epoch
    from frozenbilm_tpu.utils.checkpoint import ckpt_meta

    save_params(path, state.trainable,
                ckpt_meta(args, epoch=epoch - 1, preempted_epoch=epoch,
                          preempted_step=step), fmt=fmt)
    save_opt_state(path, state.opt_state)
    from frozenbilm_tpu.utils.checkpoint import wait_for_pending_saves

    wait_for_pending_saves()  # must be durable within the grace window
    return path
