"""On-device profiling utilities.

The reference's profiling story is ad-hoc ``std::chrono`` spans printed
to stdout (A1RobotControl.cpp:491-553, ConvexMpc.cpp:148-259). The TPU
equivalent must account for dispatch overhead: through a remote tunnel a
``fn(); block_until_ready()`` loop measures the link RTT (~28 ms here),
not the chip. :func:`time_scan` therefore times R ON-DEVICE repetitions
inside one dispatch — the step function must take and return a carry with
a real data dependency so XLA cannot CSE the iterations away.

For kernel-level traces use :func:`trace` (jax.profiler wrapper); view
with TensorBoard or xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax


def time_scan(step: Callable[[Any], Any], init: Any, *, repeats: int = 10,
              reps: int = 3, name: Optional[str] = None,
              printer=print) -> float:
    """Best-of-``reps`` per-iteration seconds for ``step`` (carry ->
    carry), measured as a ``lax.scan`` of ``repeats`` dependent
    iterations inside ONE dispatch."""
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None,
                            length=repeats)[0]

    out = run(init)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per_iter = best / repeats
    if name is not None:
        printer(f"{name:44s} {per_iter * 1e3:9.3f} ms/iter")
    return per_iter


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard/xprof-viewable) around a
    block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
