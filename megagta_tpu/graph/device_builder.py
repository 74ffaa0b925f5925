"""TPU-resident SdBG construction: reads -> BOSS rows entirely on device.

The device counterpart of graph/builder.py (which stays as the host oracle
and as the mercy/assist fallback). Where the reference streams 65536-bucket
substring sorts through RAM (src/cx1.h:443, src/cx1_read2sdbg_s1.cpp,
src/cx1_read2sdbg_s2.cpp:742-835), this path expresses the whole
construction as a handful of whole-array sorts and segmented scans that XLA
maps onto the TPU sort unit — no buckets, no multi-pass, no scatters:

  phase 1 (device): pack reads -> every (k+1)-window key + bitwise rc ->
    one 3-word lax.sort of the occurrence multiset -> run-length encode ->
    compact distinct edges to the front with a second sort.
  host: fetch ONE scalar (n_edges), pick a pow2 capacity bucket.
  phase 2 (device): derive u/v node keys bitwise -> node-multiset sort with
    u/v tags -> zero-out/zero-in nodes via backward segmented-OR scans ->
    emit the three BOSS row families (solid / $-out / tip, exactly the row
    set of s2 output_, cx1_read2sdbg_s2.cpp:742-835) -> one stable 4-word
    sort into colex(node)+rowpart order -> W flags / last bits / f[] from
    segmented scans.
  host: fetch n_rows, download the [rows] planes, assemble SdBG.

Row sort-key encoding (colex order without 3-bit chars): the BOSS order
compares reverse(node) with $ sorting first. $ appears only as a tip row's
final group char, so (first k-1 reversed chars as 2-bit words, then
last_char_code * 8 + rowpart) with last_char_code = 0 for $ / char+1
otherwise reproduces the exact host order (builder.py colex_key + _pack3)
in 4 uint32 words. Ties (identical group + rowpart, e.g. sibling tips) are
broken by construction order through a stable sort, matching the host's
stable argsort over the same solid/$-out/tip concatenation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.read_lib import ReadPackage
from ..ops.kmer_device import (
    UMAX,
    char_at,
    counted_kmers,
    mask_keys,
    reverse_keys,
    shift_keys_left,
)
from .sdbg import SdBG

__all__ = ["build_sdbg_device", "device_build_supported"]


def _seg_scan_or(vals, starts, reverse: bool = False):
    """Segmented inclusive OR scan. starts marks segment firsts; with
    reverse=True the scan runs tip-to-head so each segment START holds the
    whole segment's OR (used for per-run aggregates without gathers)."""

    def comb(a, b):
        av, ab = a
        bv, bb = b
        return jnp.where(bb, bv, av | bv), ab | bb

    if reverse:
        # reversed-segment firsts = original segment LASTS
        b = jnp.concatenate([starts[1:], jnp.ones((1,), bool)])[::-1]
        v, _ = jax.lax.associative_scan(comb, (vals[::-1], b))
        return v[::-1]
    v, _ = jax.lax.associative_scan(comb, (vals, starts))
    return v


@partial(jax.jit, static_argnames=("k1", "min_count", "prepacked"))
def _phase1(padded, lengths, k1: int, min_count: int, window_mask=None,
            prepacked: bool = False):
    """Occurrence sort + run-length encode + edge compaction.

    window_mask: optional [R, P] bool of solid windows (mercy); when set,
    only masked windows count and the min_count filter is the CALLER's
    responsibility (the mask already encodes solidity, builder.py:103).
    prepacked: `padded` is the host-packed [R, W+2] uint32 word arena
    (ops.kmer_device.pack_reads_host) — 4x fewer upload bytes.
    Returns (keys [M, 3] uint32 with distinct edges first, mult [M] int32,
    n_edges [] int32)."""
    sk, boundary, valid = counted_kmers(
        padded, lengths, k1, window_mask, prepacked
    )
    M = sk.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)
    # next boundary at or after i+1 (suffix min of boundary positions)
    arr = jnp.where(boundary, idx, M)
    sufmin = jax.lax.cummin(arr[::-1])[::-1]
    ns = jnp.concatenate([sufmin[1:], jnp.full((1,), M, jnp.int32)])
    mult = ns - idx
    edge_ok = boundary & valid
    if min_count > 1:
        edge_ok = edge_ok & (mult >= min_count)
    n_edges = edge_ok.sum(dtype=jnp.int32)
    # stable compaction: edges to the front in sorted-key order
    ckey = jnp.where(edge_ok, idx, M)
    _, k0, k1w, k2, ms = jax.lax.sort(
        (ckey, sk[:, 0], sk[:, 1], sk[:, 2], mult),
        num_keys=1, is_stable=True,
    )
    return jnp.stack([k0, k1w, k2], axis=-1), ms, n_edges


@partial(jax.jit, static_argnames=("k",))
def _phase2(ekeys, mult, n_edges, k: int):
    """BOSS row derivation from [E, 3] compacted distinct edges."""
    E = ekeys.shape[0]
    evalid = jnp.arange(E, dtype=jnp.int32) < n_edges
    ek = jnp.where(evalid[:, None], ekeys, UMAX)

    u = mask_keys(ek, k)  # source node: chars 0..k-1
    v = mask_keys(shift_keys_left(ek, 1), k)  # target node: chars 1..k
    e_char = char_at(ek, k).astype(jnp.int32)  # out-char 0..3

    # ---- node multiset: sort 2E tagged entries, find runs ----------------
    nkeys = jnp.concatenate([u, v], axis=0)
    nkeys = jnp.where(
        jnp.concatenate([evalid, evalid])[:, None], nkeys, UMAX
    )
    tag_u = jnp.concatenate(
        [jnp.ones(E, jnp.int32), jnp.zeros(E, jnp.int32)]
    )
    n0, n1, n2, tu = jax.lax.sort(
        (nkeys[:, 0], nkeys[:, 1], nkeys[:, 2], tag_u), num_keys=3
    )
    nk = jnp.stack([n0, n1, n2], axis=-1)
    nvalid = (nk != UMAX).any(axis=-1)
    nb = jnp.ones(2 * E, bool).at[1:].set((nk[1:] != nk[:-1]).any(axis=-1))
    any_u = _seg_scan_or(tu != 0, nb, reverse=True)
    any_v = _seg_scan_or(tu == 0, nb, reverse=True)
    node_start = nb & nvalid
    zero_out = node_start & ~any_u  # outdeg 0 -> $-out row
    zero_in = node_start & ~any_v  # indeg 0 -> tip row

    # ---- row families (same construction order as the host builder) ------
    km1 = k - 1
    # solid rows: group = reverse(u), rowpart = e_char
    ru = reverse_keys(u, k)
    s_w123 = mask_keys(ru, km1)
    s_w4 = (char_at(u, 0).astype(jnp.int32) + 1) * 8 + e_char
    # $-out rows: group = reverse(node), rowpart = 4
    rn = reverse_keys(nk, k)
    d_w123 = mask_keys(rn, km1)
    d_w4 = (char_at(nk, 0).astype(jnp.int32) + 1) * 8 + 4
    # tip rows: group = node chars k-2..0 then $, rowpart = 0
    t_w123 = mask_keys(shift_keys_left(rn, 1), km1)
    t_w4 = jnp.zeros(2 * E, jnp.int32)  # $ last char, rowpart 0

    def fam(w123, w4, valid, w_char, mul, is_tip, tl):
        n = w4.shape[0]
        w123 = jnp.where(valid[:, None], w123, UMAX)
        w4 = jnp.where(valid, w4, jnp.int32(0x7FFFFFFF))
        return (
            w123, w4, valid,
            w_char.astype(jnp.int32), mul.astype(jnp.int32),
            jnp.full(n, is_tip, jnp.int32), tl,
        )

    zeros3 = jnp.zeros((2 * E, 3), jnp.uint32)
    fams = [
        fam(
            s_w123, s_w4, evalid, e_char + 1, mult, 0,
            jnp.zeros((E, 3), jnp.uint32),
        ),
        fam(
            d_w123, d_w4, zero_out, jnp.zeros(2 * E, jnp.int32),
            jnp.ones(2 * E, jnp.int32), 0, zeros3,
        ),
        fam(
            t_w123, t_w4, zero_in,
            char_at(nk, km1).astype(jnp.int32) + 1,
            jnp.ones(2 * E, jnp.int32), 1, nk,
        ),
    ]
    cat = lambda i: jnp.concatenate([f[i] for f in fams], axis=0)  # noqa: E731
    w123 = cat(0)
    w4 = cat(1)
    rvalid = cat(2)
    w_char = cat(3)
    row_mult = cat(4)
    row_tip = cat(5)
    tl = cat(6)

    # ---- global stable sort into BOSS order -------------------------------
    (
        sw0, sw1, sw2, sw4, s_val, s_wc, s_mult, s_tip, t0, t1, t2,
    ) = jax.lax.sort(
        (
            w123[:, 0], w123[:, 1], w123[:, 2], w4,
            rvalid.astype(jnp.int32), w_char, row_mult, row_tip,
            tl[:, 0], tl[:, 1], tl[:, 2],
        ),
        num_keys=4, is_stable=True,
    )
    N = sw4.shape[0]
    n_rows = s_val.sum(dtype=jnp.int32)

    lastc = sw4 >> 3  # group's final char code (0 = $)
    gsame = jnp.zeros(N, bool).at[1:].set(
        (sw0[1:] == sw0[:-1])
        & (sw1[1:] == sw1[:-1])
        & (sw2[1:] == sw2[:-1])
        & (lastc[1:] == lastc[:-1])
    )
    next_diff = jnp.concatenate([~gsame[1:], jnp.ones((1,), bool)])
    last = next_diff & (s_tip == 0) & (s_val != 0)

    # s-group boundaries: first k-1 group chars change
    ssame = jnp.zeros(N, bool).at[1:].set(
        (sw0[1:] == sw0[:-1]) & (sw1[1:] == sw1[:-1]) & (sw2[1:] == sw2[:-1])
    )
    sdiff = ~ssame
    # W flag +4 when the same out-char appeared earlier in the s-group
    w_out = s_wc
    for b in range(1, 5):
        isb = w_out == b
        excl = jnp.concatenate(
            [jnp.zeros((1,), bool), _seg_scan_or(isb, sdiff)[:-1]]
        ) & ~sdiff
        w_out = jnp.where(isb & excl, b + 4, w_out)

    # f partitions by first group char (top 2 bits of word 0, +1)
    first_char = (sw0 >> jnp.uint32(30)).astype(jnp.int32) + 1
    f = jnp.stack(
        [
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        ]
        + [
            ((first_char < c) & (s_val != 0)).sum(dtype=jnp.int32)
            for c in range(2, 6)
        ]
    )
    return {
        "w": w_out,
        "last": last,
        "is_tip": s_tip,
        "mult": s_mult,
        "tl": jnp.stack([t0, t1, t2], axis=-1),
        "n_rows": n_rows,
        "f": f,
    }


def _unpack_node_words(words: np.ndarray, n_chars: int) -> np.ndarray:
    """[N, 3] uint32 big-endian keys -> [N, n_chars] int8 codes."""
    out = np.empty((len(words), n_chars), np.int8)
    for j in range(n_chars):
        w, r = divmod(j, 16)
        out[:, j] = (words[:, w] >> np.uint32(30 - 2 * r)) & 3
    return out


def device_build_supported(min_count: int, solid_mask, num_assist: int) -> bool:
    """The device path covers the production kmin-1pass configuration
    (megagta.py:274-276) and, since r4, mercy builds via a window solid
    mask (the mask derivation streams on the host; counting/BOSS run on
    device). Assist reads ride the mask too (always-solid rows)."""
    del solid_mask, num_assist
    return True


def _round_up_pow2(x: int) -> int:
    return 1 << max(6, (x - 1).bit_length())


def sdbg_from_phase2(res: dict, k: int) -> SdBG:
    """Download the phase-2 row planes (one stacked transfer after a
    row-count fetch) and assemble the host SdBG."""
    n_rows = int(res["n_rows"])  # host fetch: row-count bucket
    R = min(_round_up_pow2(max(n_rows, 1)), res["w"].shape[0])
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    planes = np.asarray(
        jnp.stack(
            [
                res["w"][:R],
                res["last"][:R].astype(jnp.int32),
                res["is_tip"][:R],
                res["mult"][:R],
                bc(res["tl"][:R, 0]),
                bc(res["tl"][:R, 1]),
                bc(res["tl"][:R, 2]),
            ]
        )
    )[:, :n_rows]
    f = np.asarray(res["f"]).astype(np.int64)
    is_tip = planes[2].astype(bool)
    tip_words = np.ascontiguousarray(planes[4:7].T[is_tip]).view(np.uint32)
    tip_labels = (
        _unpack_node_words(tip_words, k - 1)
        if tip_words.size
        else np.zeros((0, k - 1), np.int8)
    )
    return SdBG(
        k=k,
        w=planes[0].astype(np.uint8),
        last=planes[1].astype(bool),
        is_tip=is_tip,
        mult=planes[3].astype(np.int32),
        f=f,
        tip_labels=tip_labels,
    ).finalize()


def _padded_window_mask(
    package: ReadPackage, k1: int, P: int,
    solid_mask: np.ndarray, num_assist: int,
) -> np.ndarray:
    """Flat per-window solid mask (sliding_windows order: read-major,
    offset-minor) -> the padded [R, P] layout device phase 1 consumes.
    Assist reads (trailing rows) are always solid (s2 :276)."""
    lens = package.lengths
    R = package.num_reads
    nwin = np.maximum(lens - k1 + 1, 0)
    base = np.concatenate([[0], np.cumsum(nwin)])
    out = np.zeros((R, P), bool)
    rows = np.repeat(np.arange(R), nwin)
    offs = np.arange(len(solid_mask)) - base[rows]
    out[rows, offs] = solid_mask
    if num_assist:
        out[R - num_assist :, :] = True
    return out


def build_sdbg_device(
    package: ReadPackage,
    k: int,
    min_count: int = 1,
    batch_reads: int | None = None,
    solid_mask: np.ndarray | None = None,
    num_assist: int = 0,
) -> SdBG:
    """Device-resident equivalent of builder.build_sdbg (kmin-1pass path).

    Produces bit-identical (w, last, is_tip, mult, f, tip_labels) to the
    host builder (tested full-array in tests/test_device_builder.py).
    With batch_reads set and exceeded, phase 1 streams read batches through
    the device (RAM/HBM-bounded; builder.edges_from_reads_streaming) and
    only the merged distinct-edge relation reaches phase 2. solid_mask
    (the mercy mask, per fwd window) restricts counting to solid windows,
    matching builder.edges_from_reads' mask semantics."""
    k1 = k + 1
    if batch_reads and package.num_reads > batch_reads:
        from .builder import edges_from_reads_streaming
        from ..ops.dna import pack_kmers

        edges, mult_np = edges_from_reads_streaming(
            package, k, min_count, batch_reads, engine="device",
            solid_mask=solid_mask, num_assist=num_assist,
        )
        n_edges = len(edges)
        E = _round_up_pow2(max(n_edges, 1))
        words = pack_kmers(edges, k1)  # [n, W<=2] uint64 big-endian
        ek = np.full((E, 3), np.uint32(0xFFFFFFFF), np.uint32)
        ek[:n_edges, 0] = (words[:, 0] >> np.uint64(32)).astype(np.uint32)
        ek[:n_edges, 1] = (words[:, 0] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        ek[:n_edges, 2] = (
            (words[:, 1] >> np.uint64(32)).astype(np.uint32)
            if words.shape[1] > 1
            else 0
        )
        ms = np.zeros(E, np.int32)
        ms[:n_edges] = mult_np
        res = _phase2(
            jnp.asarray(ek), jnp.asarray(ms), jnp.int32(n_edges), k
        )
        return sdbg_from_phase2(res, k)
    padded, lens = package.padded()
    from ..ops.kmer_device import pack_reads_host

    words = pack_reads_host(padded)  # host 2-bit pack: 4x fewer upload B
    if solid_mask is not None:
        # the mask already encodes solidity (+ always-solid assist rows);
        # no multiplicity filter, matching builder.edges_from_reads:103
        P = padded.shape[1] - k1 + 1
        wm = jnp.asarray(
            _padded_window_mask(package, k1, P, solid_mask, num_assist)
        )
        keys, mult, n_edges_d = _phase1(
            jnp.asarray(words), jnp.asarray(lens), k1, 1, wm,
            prepacked=True,
        )
    else:
        keys, mult, n_edges_d = _phase1(
            jnp.asarray(words), jnp.asarray(lens), k1, min_count,
            prepacked=True,
        )
    n_edges = int(n_edges_d)  # host fetch 1: capacity bucket
    E = min(_round_up_pow2(max(n_edges, 1) * 2), keys.shape[0])
    E = max(E, _round_up_pow2(n_edges))
    res = _phase2(keys[:E], mult[:E], n_edges_d, k)
    return sdbg_from_phase2(res, k)
