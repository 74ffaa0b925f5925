"""Memory auto-budgeting: size the streaming/counting batches to host RAM
and the search batch to device HBM, the way the reference detects available
memory and sizes its lv1/lv2 passes to it (src/megagta.py:300 `--mem_flag`,
src/cx1.h:125-202 lv1/lv2 capacity planning).

Every knob remains overridable by CLI flags; `None`/0 means "auto"."""

from __future__ import annotations

import os

__all__ = [
    "host_memory_bytes",
    "device_memory_bytes",
    "auto_batch_reads",
    "auto_search_chunk",
]

_DEFAULT_HBM = 16 << 30  # v5e-class chip when the runtime reports nothing


def host_memory_bytes() -> int:
    """Available (not total) host RAM; the reference uses total * 0.9 when
    asked for auto (megagta.py:300)."""
    try:
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_AVPHYS_PAGES")
    except (ValueError, OSError):
        return 8 << 30


def device_memory_bytes() -> int:
    """Per-device accelerator memory (bytes_limit when the backend reports
    it; CPU backends report none and get a conservative default)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _DEFAULT_HBM


def auto_batch_reads(num_reads: int, mean_read_len: float,
                     budget: int | None = None) -> int:
    """Streaming-count batch size: the host builder materializes ~6 arrays
    of (windows per read) x 8 B per read in flight; keep that under half
    the available RAM (reference lv1 sizing, cx1.h:125-148)."""
    budget = budget if budget is not None else host_memory_bytes() // 2
    per_read = max(1.0, mean_read_len) * 6 * 8
    return int(max(65536, min(num_reads, budget / per_read)))


def auto_search_chunk(
    pool_size: int,
    main_steps: int,
    expand_width: int,
    graph_rows: int,
    graph_w: int,
    n_seeds: int,
    budget: int | None = None,
    frac: float = 0.5,
) -> int:
    """Seeds per device batch: the wavefront run holds, per seed, TWO rows
    (fwd+rev) of 7 pool planes [P] plus 4 trace planes [main_steps*B+1],
    alongside the replicated graph tables and the 64 MB path-cache table.
    Returns the largest power-of-two chunk whose arenas fit `frac` of the
    remaining device memory (clamped to [128, 8192] and n_seeds)."""
    budget = budget if budget is not None else device_memory_bytes()
    fixed = graph_rows * max(graph_w, 1) * 2 * 4 + (64 << 20)
    t_len = main_steps * expand_width + 1
    per_seed = 2 * (7 * pool_size * 4 + 4 * t_len * 4)
    avail = max(budget * frac - fixed, per_seed * 128)
    chunk = int(avail // per_seed)
    p2 = 1 << max(7, chunk.bit_length() - 1)
    cap = 1 << max(7, (max(n_seeds, 1) - 1).bit_length())
    return max(128, min(p2, 8192, cap))
