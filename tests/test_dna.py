import numpy as np

from megagta_tpu.ops.dna import pack_kmers, revcomp, sliding_windows, unpack_kmers


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for k in (5, 31, 32, 33, 45, 64):
        codes = rng.integers(0, 4, size=(20, k)).astype(np.int8)
        packed = pack_kmers(codes, k)
        assert (unpack_kmers(packed, k) == codes).all()


def test_pack_order_is_lexicographic():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(200, 45)).astype(np.int8)
    packed = pack_kmers(codes, 45)
    order = np.lexsort((packed[:, 1], packed[:, 0]))
    sorted_codes = codes[order]
    for i in range(1, len(sorted_codes)):
        assert tuple(sorted_codes[i - 1]) <= tuple(sorted_codes[i])


def test_revcomp():
    codes = np.array([0, 1, 2, 3, 0], np.int8)  # ACGTA
    rc = revcomp(codes)
    assert list(rc) == [3, 0, 1, 2, 3]  # TACGT


def test_sliding_windows():
    # two reads: ACGTA (len 5), CCG (len 3); window 3
    flat = np.array([0, 1, 2, 3, 0, 1, 1, 2], np.int8)
    starts = np.array([0, 5, 8])
    win, rid, off = sliding_windows(flat, starts, 3)
    assert win.shape == (4, 3)
    assert list(rid) == [0, 0, 0, 1]
    assert list(off) == [0, 1, 2, 0]
    assert list(win[0]) == [0, 1, 2]
    assert list(win[3]) == [1, 1, 2]


def test_sliding_windows_short_reads_skipped():
    flat = np.array([0, 1, 0, 1, 2, 3], np.int8)
    starts = np.array([0, 2, 6])  # read0 len 2 < window
    win, rid, off = sliding_windows(flat, starts, 4)
    assert list(rid) == [1]
    assert list(win[0]) == [0, 1, 2, 3]
