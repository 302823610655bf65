"""Wall-clock profiler (SURVEY C26).

The reference's TimeIt accumulates per-function wall time with optional
torch.cuda.synchronize (/root/reference/elastic_diffusion.py:33-70). TPU
analog: block_until_ready on function outputs when sync is on, plus an
optional jax.profiler trace context.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class TimeIt:
    def __init__(self, sync: bool = False):
        self.sync = sync
        self.total_time: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def _sync(self, value=None):
        if self.sync:
            if value is not None:
                try:
                    jax.block_until_ready(value)
                    return
                except Exception:
                    pass
            (jax.device_put(0.0) + 0).block_until_ready()

    def time_function(self, func):
        def wrapper(*args, **kwargs):
            self._sync()
            start = time.time()
            result = func(*args, **kwargs)
            self._sync(result)
            name = f"FUNCTION_{func.__name__}"
            self.total_time[name] = self.total_time.get(name, 0.0) + time.time() - start
            self.counts[name] = self.counts.get(name, 0) + 1
            return result
        return wrapper

    @contextlib.contextmanager
    def time_block(self, title: str):
        self._sync()
        start = time.time()
        try:
            yield
        finally:
            self._sync()
            name = f"BLOCK_{title}"
            self.total_time[name] = self.total_time.get(name, 0.0) + time.time() - start
            self.counts[name] = self.counts.get(name, 0) + 1

    def print_results(self):
        for key, spent in self.total_time.items():
            print(f"{key} took total {spent:.3f} seconds "
                  f"({self.counts.get(key, 0)} calls).")


timelog = TimeIt(sync=False)
