"""Static shape buckets: the compile-cache policy.

The reference sidesteps dynamic shapes by rebuilding GGML graphs every step —
the exact anti-pattern on TPU (SURVEY.md §7 hard part #5). Here every dynamic
quantity (text length, frame budget, audio length) is padded up to one of a
fixed set of buckets, so each pipeline stage compiles a handful of programs
total and never recompiles at serving time.
"""

from __future__ import annotations

from typing import Sequence


def pick_bucket(value: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= value (max bucket if value exceeds them all)."""
    for b in buckets:
        if value <= b:
            return b
    return max(buckets)
