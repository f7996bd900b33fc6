"""Profiling: trace capture + per-op time attribution.

TPU-native replacement for the reference's perf tooling — a compile-time
`-DPERF` flag that adds device syncs for wall-clock timing (reference:
CMakeLists.txt:130-133, sole use src/layers/attention/context_attention.cpp:
113-116) and offline Nsight-Compute captures (reference: kernel_review/
*.ncu-rep). Here: `trace(...)` captures a jax.profiler xplane during any
callable, and `op_totals(...)` aggregates per-XLA-op device time from it —
the workflow that found every decode bottleneck in this repo (scan-slice
weight copies, cache re-stacking, per-head attention serialization).
"""

from __future__ import annotations

import contextlib
import glob
import os
import tempfile
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Context manager: captures a profiler trace around the body.

        with profiling.trace("/tmp/trace") as d:
            run_model()
        print(profiling.format_op_totals(profiling.op_totals(d)))
    """
    import jax
    d = log_dir or tempfile.mkdtemp(prefix="llmi_trace_")
    jax.profiler.start_trace(d)
    try:
        yield d
    finally:
        jax.profiler.stop_trace()


def _xplane_files(log_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.xplane.pb")))


def op_totals(log_dir: str) -> Dict[str, Tuple[float, int]]:
    """Aggregate device time per XLA op from a captured trace.

    Returns {op_name: (total_seconds, count)}, summed over the "XLA Ops"
    event line of every plane. Requires the tensorflow package for the
    xplane protobuf schema (present in this environment; the
    tensorboard_plugin_profile converter is NOT required)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = _xplane_files(log_dir)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    tot: Dict[str, float] = defaultdict(float)
    cnt: Dict[str, int] = defaultdict(int)
    for path in files:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    tot[name] += ev.duration_ps / 1e12
                    cnt[name] += 1
    return {k: (v, cnt[k]) for k, v in tot.items()}


def format_op_totals(totals: Dict[str, Tuple[float, int]],
                     top: int = 25, name_width: int = 80) -> str:
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    out = [f"{'total':>10} {'count':>7}  op"]
    for name, (t, c) in rows[:top]:
        out.append(f"{t*1e3:9.3f}ms {c:7d}  {name[:name_width]}")
    return "\n".join(out)
