"""Terminal loss sparkline — the textplots chart equivalent
(src/main.rs:76-79), one line instead of a redrawn full-history plot."""

from __future__ import annotations

from typing import Sequence

_BLOCKS = " ▁▂▃▄▅▆▇█"


def sparkline(values: Sequence[float], width: int = 60) -> str:
    vals = [v for v in values if v == v]  # drop NaNs
    if not vals:
        return ""
    if len(vals) > width:
        # bucket-average down to width
        n = len(vals)
        vals = [
            sum(vals[i * n // width : max(i * n // width + 1, (i + 1) * n // width)])
            / max(1, (i + 1) * n // width - i * n // width)
            for i in range(width)
        ]
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    return "".join(_BLOCKS[int((v - lo) / span * (len(_BLOCKS) - 1))] for v in vals)
