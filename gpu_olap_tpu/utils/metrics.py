"""Metrics / observability.

The reference has log lines only (SURVEY.md §5); BASELINE targets require a
bytes-moved / rows-per-second meter with HBM-roofline accounting, so the engine
carries a metrics registry: per-operator wall clock, rows in/out, bytes
touched, and achieved fraction of the per-chip HBM bandwidth roofline.
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Dict, List, Optional

# Per-chip HBM bandwidth estimates (bytes/s) for roofline accounting.
HBM_BW_BY_PLATFORM = {
    "tpu v4": 1.2e12,
    "tpu v5 lite": 8.2e11,   # v5e: ~819 GB/s
    "tpu v5": 2.8e12,        # v5p
    "tpu v6 lite": 1.6e12,   # v6e (Trillium)
    "cpu": 5.0e10,
}


def detect_hbm_bandwidth() -> float:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
        for key, bw in HBM_BW_BY_PLATFORM.items():
            if key in kind:
                return bw
    except Exception:
        pass
    return HBM_BW_BY_PLATFORM["cpu"]


@dataclasses.dataclass
class OpStats:
    calls: int = 0
    seconds: float = 0.0
    rows_in: int = 0
    rows_out: int = 0
    bytes_accessed: int = 0

    @property
    def rows_per_sec(self) -> float:
        return self.rows_in / self.seconds if self.seconds > 0 else 0.0


class MetricsRegistry:
    def __init__(self):
        self.ops: Dict[str, OpStats] = collections.defaultdict(OpStats)
        self.counters: Dict[str, float] = collections.defaultdict(float)
        self._hbm_bw: Optional[float] = None

    def record_span(self, label: str, seconds: float, rows_in: int = 0,
                    rows_out: int = 0, bytes_accessed: int = 0, **_):
        st = self.ops[label]
        st.calls += 1
        st.seconds += seconds
        st.rows_in += rows_in
        st.rows_out += rows_out
        st.bytes_accessed += bytes_accessed

    def bump(self, name: str, value: float = 1.0):
        self.counters[name] += value

    @property
    def hbm_bandwidth(self) -> float:
        if self._hbm_bw is None:
            self._hbm_bw = detect_hbm_bandwidth()
        return self._hbm_bw

    def roofline_fraction(self, label: str) -> float:
        """Achieved HBM bandwidth fraction for an operator."""
        st = self.ops.get(label)
        if st is None or st.seconds == 0:
            return 0.0
        return (st.bytes_accessed / st.seconds) / self.hbm_bandwidth

    def summary(self) -> List[dict]:
        out = []
        for label, st in sorted(self.ops.items()):
            out.append({
                "op": label,
                "calls": st.calls,
                "seconds": round(st.seconds, 6),
                "rows_in": st.rows_in,
                "rows_out": st.rows_out,
                "bytes": st.bytes_accessed,
                "rows_per_sec": round(st.rows_per_sec, 1),
                "hbm_roofline_frac": round(self.roofline_fraction(label), 4),
            })
        return out

    def reset(self):
        self.ops.clear()
        self.counters.clear()


GLOBAL_METRICS = MetricsRegistry()


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False
