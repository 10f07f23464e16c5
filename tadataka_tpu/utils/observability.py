"""Structured per-frame metrics and profiling hooks.

The reference's observability is ad-hoc prints (SURVEY.md §5).  Here:
per-frame metric records (pose, timing, flag histogram, inlier counts)
accumulate into a jsonl-serializable log, and the profiler contextmanager
wraps jax.profiler traces for xprof.
"""

import contextlib
import json
import time

import numpy as np

from tadataka_tpu.flags import Flag, flag_histogram


class MetricsLogger:
    def __init__(self, path=None):
        self.records = []
        self.path = path

    def log_frame(self, frame_index, **metrics):
        record = {"frame": int(frame_index), "t_wall": time.time()}
        for k, v in metrics.items():
            record[k] = _jsonable(v)
        self.records.append(record)
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        return record

    def summary(self):
        """Mean of every numeric metric across frames."""
        keys = set().union(*(r.keys() for r in self.records)) \
            if self.records else set()
        out = {}
        for k in keys - {"frame", "t_wall"}:
            vals = [r[k] for r in self.records
                    if k in r and isinstance(r[k], (int, float))]
            if vals:
                out[k] = float(np.mean(vals))
        return out


def _jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if hasattr(v, "tolist"):
        return np.asarray(v).tolist()
    return v


def flag_stats(flag_map):
    """Flag histogram as a {flag_name: count} dict."""
    hist = np.asarray(flag_histogram(flag_map))
    return {f.name: int(hist[-int(f)]) for f in Flag}


@contextlib.contextmanager
def profile_trace(logdir):
    """jax.profiler trace context (open the result with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(record, key):
    """Wall-time a block into record[key] (blocks on async dispatch only if
    the caller block_until_ready's inside)."""
    t0 = time.perf_counter()
    yield
    record[key] = time.perf_counter() - t0
