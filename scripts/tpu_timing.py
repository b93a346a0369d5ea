"""Reliable micro-timing through the axon TPU tunnel.

Thin CLI-script wrapper over lsr_tpu.utils.devtime (see its module doc for
why block_until_ready-based timing is invalid on this backend).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsr_tpu.utils.devtime import probe as _probe  # noqa: F401,E402
from lsr_tpu.utils.devtime import slope_ms  # noqa: E402


def bench_fn(name, fn, *args, iters=(4, 20)):
    """Print slope-method ms/call for fn(*args); returns the last output."""
    out, ms = slope_ms(fn, *args, iters=iters)
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    bench_fn.last_ms = ms
    return out
