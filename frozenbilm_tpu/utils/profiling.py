"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5.1 — only wall-clock in MetricLogger);
this is a first-class TPU-native replacement:
  - `trace(logdir)`: XLA/TPU profiler traces viewable in TensorBoard/xprof
  - `annotate(name)`: named trace spans around host-side phases
  - StepProfiler: captures a trace window of K steps starting at step N,
    plus per-step wall time and achieved tokens/sec
  - device_memory_stats(): per-device HBM usage (replaces
    torch.cuda.max_memory_allocated in reference metrics.py:158)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace into `logdir` for the scope's duration."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the trace viewer."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, float]:
    import jax

    out = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if key in stats:
                out[key + "_mb"] = stats[key] / (1024 * 1024)
    except Exception:
        pass
    return out


def device_op_times(tracedir: str) -> Dict[str, float]:
    """Per-op device self-time (seconds) from a trace directory.

    Parses the exported Chrome-trace files under `tracedir`, keeps only
    complete events on DEVICE processes (process_name metadata containing
    '/device:' or 'TPU'), and sums duration by op name. Host-side python /
    ThunkExecutor events would otherwise dominate the totals and poison any
    class breakdown built on them.

    Falls back to a name-based host filter when no device process exists in
    the trace (the CPU backend emits only host threads) — good enough for
    smoke runs, exact on TPU.
    """
    import glob
    import gzip
    import json

    events = []
    pid_names: Dict[int, str] = {}
    for f in glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ev.get("ph") == "X" and "dur" in ev:
                events.append(ev)

    device_pids = {p for p, n in pid_names.items()
                   if "/device:" in n or "TPU" in n.upper()}
    tot: Dict[str, float] = {}
    if device_pids:
        keep = [ev for ev in events if ev.get("pid") in device_pids]
    else:
        host_markers = (".py", "np.asarray", "thunkexecutor", "$", "::",
                        "pjitfunction", "parsearguments", "handle inputs")
        keep = [ev for ev in events
                if not any(m in ev.get("name", "").lower() or m in ev.get("name", "")
                           for m in host_markers)]
    for ev in keep:
        name = ev.get("name", "")
        tot[name] = tot.get(name, 0.0) + ev["dur"] / 1e6
    return tot


def matmul_class_split(op_times: Dict[str, float]) -> Dict[str, float]:
    """Bucket per-op device times into {'matmul': s, 'other': s}."""
    classes = {"matmul": 0.0, "other": 0.0}
    for n, s in op_times.items():
        low = n.lower()
        if any(k in low for k in ("dot", "convolution", "matmul")):
            classes["matmul"] += s
        else:
            classes["other"] += s
    return classes


class StepProfiler:
    """Per-step timing + an optional trace window.

    Usage:
        prof = StepProfiler(logdir="/tmp/trace", start_step=5, num_steps=3)
        for batch in loader:
            with prof.step(tokens=batch_tokens):
                state, m = trainer.train_step(...)
        print(prof.summary())
    """

    def __init__(self, logdir: Optional[str] = None, start_step: int = 5,
                 num_steps: int = 3):
        self.logdir = logdir
        self.start_step = start_step
        self.num_steps = num_steps
        self._step = 0
        self._tracing = False
        self._times = []
        self._tokens = []

    @contextlib.contextmanager
    def step(self, tokens: int = 0):
        import jax

        if self.logdir and self._step == self.start_step and not self._tracing:
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
        t0 = time.perf_counter()
        yield
        self._times.append(time.perf_counter() - t0)
        self._tokens.append(tokens)
        self._step += 1
        if self._tracing and self._step >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._tracing = False

    def close(self):
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        steady = self._times[1:] or self._times  # drop compile step
        avg = sum(steady) / len(steady)
        out = {
            "steps": float(len(self._times)),
            "avg_step_time_s": avg,
            "steps_per_sec": 1.0 / avg if avg else 0.0,
        }
        total_tokens = sum(self._tokens[1:]) if len(self._tokens) > 1 else sum(self._tokens)
        total_time = sum(steady)
        if total_tokens and total_time:
            out["tokens_per_sec"] = total_tokens / total_time
        out.update(device_memory_stats())
        return out
