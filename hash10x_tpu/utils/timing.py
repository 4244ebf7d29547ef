"""Per-command timing/RSS reports — the ``timeUpdate`` analog.

The reference prints user/sys CPU time and max-RSS deltas after every CLI command
(``utils.c:~timeUpdate``, SURVEY.md §3.1 #16, §6 "keep the print elapsed+mem after
each command UX").  Here: wall + CPU + RSS delta lines on stderr, plus optional
JSONL metrics (SURVEY.md §6 observability row).
"""

from __future__ import annotations

import json
import resource
import sys
import time

__all__ = ["StageTimer"]


class StageTimer:
    def __init__(self, log=sys.stderr, jsonl_path=None, device_mem=False):
        self.log = log
        self.jsonl = open(jsonl_path, "a") if jsonl_path else None
        self.device_mem = device_mem
        self._last_wall = time.monotonic()
        self._last_ru = resource.getrusage(resource.RUSAGE_SELF)
        self._t0 = self._last_wall

    @property
    def enabled(self) -> bool:
        """Whether any sink consumes stage lines — callers gate expensive
        stage METADATA (device fetches, collectives) on this so a silenced
        timer costs zero device syncs.  Must be uniform across processes in
        multi-process runs (collective metadata would deadlock otherwise)."""
        return self.log is not None or self.jsonl is not None

    @staticmethod
    def _hbm_mb():
        """Device bytes_in_use in MB, or None where the backend lacks
        memory_stats (the HBM counter of SURVEY.md §6's tracing row)."""
        try:
            import jax
            s = jax.local_devices()[0].memory_stats()
            return s["bytes_in_use"] / 1e6 if s else None
        except Exception:
            return None

    def stage(self, label: str) -> None:
        now = time.monotonic()
        ru = resource.getrusage(resource.RUSAGE_SELF)
        wall = now - self._last_wall
        user = ru.ru_utime - self._last_ru.ru_utime
        syst = ru.ru_stime - self._last_ru.ru_stime
        rss_mb = ru.ru_maxrss / 1024.0
        hbm = self._hbm_mb() if self.device_mem else None
        hbm_txt = f" HBM {hbm:.0f}MB" if hbm is not None else ""
        if self.log is not None:
            self.log.write(f"[{label}] wall {wall:.2f}s user {user:.2f}s "
                           f"sys {syst:.2f}s maxRSS {rss_mb:.0f}MB{hbm_txt}\n")
        if self.jsonl is not None:
            rec = {
                "stage": label, "wall_s": round(wall, 4), "user_s": round(user, 4),
                "sys_s": round(syst, 4), "max_rss_mb": round(rss_mb, 1),
                "t_total_s": round(now - self._t0, 4)}
            if hbm is not None:
                rec["hbm_in_use_mb"] = round(hbm, 1)
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        self._last_wall = now
        self._last_ru = ru

    def total(self) -> float:
        return time.monotonic() - self._t0
