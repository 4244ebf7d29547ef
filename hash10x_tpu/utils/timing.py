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
    def __init__(self, log=sys.stderr, jsonl_path=None):
        self.log = log
        self.jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._last_wall = time.monotonic()
        self._last_ru = resource.getrusage(resource.RUSAGE_SELF)
        self._t0 = self._last_wall

    def stage(self, label: str) -> None:
        now = time.monotonic()
        ru = resource.getrusage(resource.RUSAGE_SELF)
        wall = now - self._last_wall
        user = ru.ru_utime - self._last_ru.ru_utime
        syst = ru.ru_stime - self._last_ru.ru_stime
        rss_mb = ru.ru_maxrss / 1024.0
        if self.log is not None:
            self.log.write(f"[{label}] wall {wall:.2f}s user {user:.2f}s "
                           f"sys {syst:.2f}s maxRSS {rss_mb:.0f}MB\n")
        if self.jsonl is not None:
            self.jsonl.write(json.dumps({
                "stage": label, "wall_s": round(wall, 4), "user_s": round(user, 4),
                "sys_s": round(syst, 4), "max_rss_mb": round(rss_mb, 1),
                "t_total_s": round(now - self._t0, 4)}) + "\n")
            self.jsonl.flush()
        self._last_wall = now
        self._last_ru = ru

    def total(self) -> float:
        return time.monotonic() - self._t0
