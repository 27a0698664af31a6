"""Stream block planning.

Behavioral reference: `chunker.chunker` (ref chunker.py:21-45): fixed-size
blocks of PROC_CHUNKSIZE samples plus one remainder block. Block boundaries are
part of the numeric contract (strict resample and Hilbert run per block), so
the plan must reproduce the reference's exact split.

The reference's string-keyed KV store for cross-block op state (ref
chunker.py:54-84) is replaced by the explicit `StreamState` pytree carried by
the pipeline, plus closed-form per-block metadata (`stream.pipeline`).
"""
from __future__ import annotations

from ..constants import PROC_CHUNKSIZE


def plan_blocks(length: int, block_size: int = PROC_CHUNKSIZE) -> list[tuple[int, int]]:
    """[start, end) block spans over a signal of `length` samples."""
    blocks: list[tuple[int, int]] = []
    i = 0
    while i + block_size < length:
        blocks.append((i, i + block_size))
        i += block_size
    if not blocks:
        blocks.append((0, length))
    elif blocks[-1][1] != length:
        blocks.append((blocks[-1][1], length))
    return blocks
