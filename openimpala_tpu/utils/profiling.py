"""Tracing / profiling — the TPU-native equivalent of the reference's
AMReX ``BL_PROFILE`` scope markers and ``amrex::second()`` wall-clocks
(``TortuosityHypre.cpp:250,303,399,564,655,897,1002``, ``Diffusion.cpp:176,
737-740``).

Two tiers, matching SURVEY.md §5:

* ``phase_timer(name)`` — named wall-clock scopes accumulated into a global
  per-phase table (``report()``/``reset()``); also enters ``jax.named_scope``
  so the region is visible in XLA/profiler traces.  Zero overhead beyond a
  ``time.perf_counter`` pair when profiling is off.
* ``device_trace(logdir)`` — wraps ``jax.profiler.trace`` for full XProf
  device traces (op-level timeline, HBM traffic), the deep-dive analogue of
  AMReX TinyProfiler output.  View with TensorBoard.

Enable the wall-clock table globally with ``OPENIMPALA_PROFILE=1`` or
``enable(True)``; drivers call ``phase_timer`` unconditionally.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_ENABLED = os.environ.get("OPENIMPALA_PROFILE", "0") == "1"
_TABLE: dict[str, list] = defaultdict(lambda: [0, 0.0])  # name -> [calls, secs]


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = bool(on)


@contextlib.contextmanager
def phase_timer(name: str):
    """Named scope: wall-clock accumulation + jax.named_scope annotation."""
    try:
        import jax

        scope = jax.named_scope(name)
    except Exception:  # jax not initialised / host-only code paths
        scope = contextlib.nullcontext()
    t0 = time.perf_counter()
    with scope:
        yield
    if _ENABLED:
        row = _TABLE[name]
        row[0] += 1
        row[1] += time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(logdir: str):
    """Full XProf device trace (TensorBoard-viewable)."""
    import jax

    with jax.profiler.trace(logdir):
        yield


def report(file=None) -> str:
    """TinyProfiler-style per-phase table (name, calls, total s, mean ms)."""
    lines = [f"{'phase':<40} {'calls':>6} {'total_s':>10} {'mean_ms':>10}"]
    for name, (calls, secs) in sorted(_TABLE.items(), key=lambda kv: -kv[1][1]):
        mean_ms = 1e3 * secs / calls if calls else 0.0
        lines.append(f"{name:<40} {calls:>6} {secs:>10.3f} {mean_ms:>10.2f}")
    out = "\n".join(lines)
    if file is not None:
        print(out, file=file, flush=True)
    return out


def reset():
    _TABLE.clear()
