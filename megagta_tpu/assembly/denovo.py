"""De novo intermediate-k assembly driver (reference `denovo` subcommand).

main_assemble equivalent (src/assembler.cpp:98-168): load graph -> remove
tips -> pop bubbles -> extract unitig contigs with stats.
"""

from __future__ import annotations

import numpy as np

from ..graph.sdbg import SdBG
from ..utils.logging import log
from .bubbles import pop_bubbles
from .tips import remove_tips
from .unitigs import Contig, extract_contigs

__all__ = ["assemble", "contig_stats"]


def contig_stats(lengths: list[int]) -> dict:
    if not lengths:
        return {"count": 0, "total": 0, "n50": 0, "mean": 0, "max": 0}
    arr = np.sort(np.asarray(lengths))[::-1]
    total = int(arr.sum())
    csum = np.cumsum(arr)
    n50 = int(arr[np.searchsorted(csum, total * 0.5)])
    return {
        "count": len(arr),
        "total": total,
        "n50": n50,
        "mean": int(arr.mean()),
        "max": int(arr[0]),
    }


def assemble(
    dbg: SdBG,
    max_tip_len: int = 150,
    min_contig: int = 0,
    no_bubble: bool = False,
    engine: str = "vectorized",
) -> tuple[list[Contig], dict]:
    """engine: "vectorized" (default; lockstep walks + pointer doubling,
    assembly/vectorized.py) or "sequential" (per-node oracle)."""
    from .vectorized import extract_contigs_vec, remove_tips_vec

    vec = engine == "vectorized"
    if max_tip_len == -1:
        max_tip_len = dbg.k * 2
    if max_tip_len > 0:
        n_tips = (remove_tips_vec if vec else remove_tips)(dbg, max_tip_len)
        log(f"tips removed: {n_tips}")
    if not no_bubble:
        n_bub = pop_bubbles(dbg)
        log(f"bubbles popped: {n_bub}")
    contigs = (extract_contigs_vec if vec else extract_contigs)(dbg, min_contig)
    stats = contig_stats([len(c.seq) for c in contigs])
    log(
        f"contigs: {stats['count']}, total {stats['total']}, "
        f"N50 {stats['n50']}, max {stats['max']}"
    )
    return contigs, stats
