"""Device-side (k+1)-mer extraction, canonical emission and sort-counting.

The TPU compute path for the reference's CX1 stage-2 scan/sort
(src/cx1_read2sdbg_s1.cpp lv0/lv1 scans + src/lv2_cpu_sort.h): reads are
packed into big-endian 2-bit words on device, every window key is extracted
with bit arithmetic (no per-char loops at runtime), reverse complements are
derived bitwise, and the whole occurrence multiset is ordered with one
lax.sort over 3 uint32 key words — XLA maps this onto the TPU's sort HLO.

Keys are 96-bit big-endian: chars 0..44 in bits 95..6 (two bits each, A=00
.. T=11). The all-ones key is the invalid/padding sentinel (sorts last; no
real 45-char key can reach it because the low 6 bits of real keys are 0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pack_reads_device",
    "pack_reads_host",
    "window_keys",
    "rc_keys",
    "count_sorted",
    "counted_kmers",
]


def pack_reads_host(padded: np.ndarray) -> np.ndarray:
    """numpy twin of pack_reads_device ([R, L] int8 -> [R, W+2] uint32,
    identical bit layout): packing on the HOST quarters the bytes shipped
    to the accelerator — on a tunneled chip the read upload dominates the
    warm build wall (0.9 s of 1.24 s at prod scale)."""
    R, L = padded.shape
    W = (L + 15) // 16
    c = np.clip(padded, 0, 3).astype(np.uint32)
    pad = W * 16 - L
    if pad:
        c = np.pad(c, ((0, 0), (0, pad)))
    c = c.reshape(R, W, 16)
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * np.uint32(2)
    words = (c << shifts[None, None, :]).sum(-1, dtype=np.uint32)
    return np.pad(words, ((0, 0), (0, 2)))

# byte -> byte with its four 2-bit chars reversed (for bitwise rc)
_REV2 = np.zeros(256, np.uint32)
for b in range(256):
    _REV2[b] = (
        ((b & 0x03) << 6) | ((b & 0x0C) << 2) | ((b & 0x30) >> 2) | ((b & 0xC0) >> 6)
    )
_REV2_J = jnp.asarray(_REV2)

UMAX = jnp.uint32(0xFFFFFFFF)


def pack_reads_device(padded: jnp.ndarray) -> jnp.ndarray:
    """[R, L] int8 codes -> [R, ceil(L/16)+1] uint32 big-endian words.

    One trailing zero word lets window extraction read word pairs without
    bounds checks.
    """
    R, L = padded.shape
    W = (L + 15) // 16
    c = jnp.clip(padded, 0, 3).astype(jnp.uint32)
    pad = W * 16 - L
    if pad:
        c = jnp.pad(c, ((0, 0), (0, pad)))
    c = c.reshape(R, W, 16)
    shifts = jnp.arange(15, -1, -1, dtype=jnp.uint32) * 2
    words = jnp.sum(c << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    # two trailing zero words: window extraction reads up to 4 consecutive
    # words for any k1 <= 48 without bounds checks
    return jnp.pad(words, ((0, 0), (0, 2)))


def _extract96(words: jnp.ndarray, p: jnp.ndarray):
    """96-bit window keys starting at char position p (broadcast over p).

    words: [R, W] uint32; p: [P] int32. Returns three [R, P] uint32 planes.
    """
    word_idx = p // 16
    bit = (p % 16).astype(jnp.uint32) * 2

    def word_at(off):
        return words[:, word_idx + off]  # [R, P]

    w0, w1, w2, w3 = (word_at(i) for i in range(4))

    def seg(a, b):
        hi = jnp.where(bit == 0, a, (a << bit) | (b >> (32 - jnp.maximum(bit, 1))))
        return jnp.where(bit == 0, a, hi)

    k0 = seg(w0, w1)
    k1 = seg(w1, w2)
    k2 = seg(w2, w3)
    return k0, k1, k2


def window_keys(words: jnp.ndarray, lengths: jnp.ndarray, k1: int):
    """All (k1 = k+1)-length window keys of every read.

    Returns ([R, P, 3] uint32 keys, [R, P] bool valid) with P = L - k1 + 1
    positions per padded row; invalid rows hold the sentinel.
    """
    R = words.shape[0]
    Lmax = (words.shape[1] - 2) * 16
    P = Lmax - k1 + 1
    p = jnp.arange(P, dtype=jnp.int32)
    k0, k_1, k_2 = _extract96(words, p)
    # mask to k1 chars: zero bits below char k1
    total_bits = k1 * 2
    m0 = jnp.uint32(0xFFFFFFFF if total_bits >= 32 else ~((1 << (32 - total_bits)) - 1) & 0xFFFFFFFF)
    b1 = max(0, min(32, total_bits - 32))
    m1 = jnp.uint32(((0xFFFFFFFF << (32 - b1)) & 0xFFFFFFFF) if b1 else 0)
    b2 = max(0, min(32, total_bits - 64))
    m2 = jnp.uint32(((0xFFFFFFFF << (32 - b2)) & 0xFFFFFFFF) if b2 else 0)
    keys = jnp.stack([k0 & m0, k_1 & m1, k_2 & m2], axis=-1)
    valid = p[None, :] + k1 <= lengths[:, None]
    keys = jnp.where(valid[..., None], keys, UMAX)
    return keys, valid


def char_masks(n_chars: int):
    """uint32 masks clearing bits below char `n_chars` of a 96-bit key."""
    total_bits = n_chars * 2
    m0 = jnp.uint32(
        0xFFFFFFFF
        if total_bits >= 32
        else ~((1 << (32 - total_bits)) - 1) & 0xFFFFFFFF
    )
    b1 = max(0, min(32, total_bits - 32))
    m1 = jnp.uint32(((0xFFFFFFFF << (32 - b1)) & 0xFFFFFFFF) if b1 else 0)
    b2 = max(0, min(32, total_bits - 64))
    m2 = jnp.uint32(((0xFFFFFFFF << (32 - b2)) & 0xFFFFFFFF) if b2 else 0)
    return m0, m1, m2


def mask_keys(keys: jnp.ndarray, n_chars: int) -> jnp.ndarray:
    """Clear chars >= n_chars of [..., 3] uint32 big-endian keys."""
    m0, m1, m2 = char_masks(n_chars)
    return jnp.stack(
        [keys[..., 0] & m0, keys[..., 1] & m1, keys[..., 2] & m2], axis=-1
    )


def shift_keys_left(keys: jnp.ndarray, n_chars: int) -> jnp.ndarray:
    """Drop the first n_chars chars of [..., 3] keys (shift toward MSB);
    the vacated low chars are NOT masked (mask_keys afterwards)."""
    b = 2 * n_chars
    assert 0 < b < 32
    x0, x1, x2 = keys[..., 0], keys[..., 1], keys[..., 2]
    s = jnp.uint32(b)
    r = jnp.uint32(32 - b)
    return jnp.stack(
        [(x0 << s) | (x1 >> r), (x1 << s) | (x2 >> r), x2 << s], axis=-1
    )


def char_at(keys: jnp.ndarray, j: int) -> jnp.ndarray:
    """Char j (0 = most significant) of [..., 3] uint32 keys, 0..3."""
    w, r = divmod(j, 16)
    return (keys[..., w] >> jnp.uint32(30 - 2 * r)) & 3


def reverse_keys(keys: jnp.ndarray, k1: int) -> jnp.ndarray:
    """Char order reversal of the first k1 chars of [..., 3] uint32 keys
    (no complement); chars >= k1 are cleared."""
    x0, x1, x2 = keys[..., 0], keys[..., 1], keys[..., 2]

    def rev_word(w):
        b0 = _REV2_J[(w >> 24) & 0xFF]
        b1 = _REV2_J[(w >> 16) & 0xFF]
        b2 = _REV2_J[(w >> 8) & 0xFF]
        b3 = _REV2_J[w & 0xFF]
        return (b3 << 24) | (b2 << 16) | (b1 << 8) | b0

    # full 96-bit char reversal = word order swap + per-word reversal
    zero = jnp.zeros_like(x0)
    r = [rev_word(x2), rev_word(x1), rev_word(x0), zero, zero]
    # chars now ordered c47..c0; shift left by (48 - k1) chars so that
    # c_{k1-1}..c0 start at the top. k1 is static: decompose the shift into
    # whole words + bits at trace time (a uint32 shift by >= 32 is undefined).
    wsh, bsh = divmod((48 - k1) * 2, 32)

    def shl(a, b):
        if bsh == 0:
            return a
        return (a << jnp.uint32(bsh)) | (b >> jnp.uint32(32 - bsh))

    s0 = shl(r[wsh], r[wsh + 1])
    s1 = shl(r[wsh + 1], r[wsh + 2])
    s2 = shl(r[wsh + 2], r[wsh + 3])
    m0, m1, m2 = char_masks(k1)
    return jnp.stack([s0 & m0, s1 & m1, s2 & m2], axis=-1)


def rc_keys(keys: jnp.ndarray, k1: int) -> jnp.ndarray:
    """Bitwise reverse complement of [..., 3] uint32 window keys."""
    rev = reverse_keys(keys, k1)
    m0, m1, m2 = char_masks(k1)
    return jnp.stack(
        [(~rev[..., 0]) & m0, (~rev[..., 1]) & m1, (~rev[..., 2]) & m2],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("k1", "prepacked"))
def counted_kmers(
    padded: jnp.ndarray,
    lengths: jnp.ndarray,
    k1: int,
    window_mask: jnp.ndarray | None = None,
    prepacked: bool = False,
):
    """Full device counting pipeline.

    window_mask: optional [R, P] bool — only masked-True windows count
    (the mercy solid mask, reference s2 solid-window semantics).
    prepacked: `padded` is already the [R, W+2] uint32 word arena
    (pack_reads_host) instead of [R, L] int8 codes.
    Returns (sorted_keys [M, 3] uint32, run_start [M] bool, valid [M] bool):
    the sorted double-stranded occurrence multiset (palindromes once) with
    run boundaries; distinct edges and multiplicities fall out of run ids.
    """
    words = padded if prepacked else pack_reads_device(padded)
    fwd, valid = window_keys(words, lengths, k1)
    if window_mask is not None:
        # window_keys pads rows to 16-char word multiples, so its position
        # axis can exceed the caller's (padded_len - k1 + 1) mask width
        gap = valid.shape[1] - window_mask.shape[1]
        if gap:
            window_mask = jnp.pad(window_mask, ((0, 0), (0, gap)))
        valid = valid & window_mask
        fwd = jnp.where(valid[..., None], fwd, UMAX)
    rc = rc_keys(fwd, k1)
    palin = (fwd == rc).all(axis=-1)
    rc = jnp.where((valid & ~palin)[..., None], rc, UMAX)

    R, P, _ = fwd.shape
    allk = jnp.concatenate([fwd.reshape(-1, 3), rc.reshape(-1, 3)], axis=0)
    return count_sorted(allk)


def count_sorted(keys: jnp.ndarray):
    """Sort [M, 3] uint32 keys lexicographically; mark run starts.

    Returns (sorted_keys, run_start, valid); run_start marks boundaries of
    ALL runs including the trailing sentinel run (AND with valid for real
    edges; the raw boundary is needed to bound the last real run's length).
    """
    s0, s1, s2 = jax.lax.sort(
        (keys[:, 0], keys[:, 1], keys[:, 2]), num_keys=3
    )
    sk = jnp.stack([s0, s1, s2], axis=-1)
    neq = jnp.ones(sk.shape[0], bool)
    neq = neq.at[1:].set((sk[1:] != sk[:-1]).any(axis=-1))
    valid = (sk != UMAX).any(axis=-1)
    return sk, neq, valid
