"""Native C++ runtime components vs their Python equivalents."""

import numpy as np
import pytest

from megagta_tpu.native import get_lib, parse_fastx_native, radix_argsort

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no toolchain?)"
)


def test_radix_argsort_matches_lexsort():
    rng = np.random.default_rng(3)
    for n, w in ((1000, 1), (5000, 2), (3000, 3)):
        keys = rng.integers(0, 2**63, size=(n, w), dtype=np.uint64)
        perm = radix_argsort(keys)
        ref = np.lexsort(tuple(keys[:, j] for j in range(w - 1, -1, -1)))
        assert (keys[perm] == keys[ref]).all()


def test_native_fastx_matches_python(tmp_path):
    fa = tmp_path / "t.fa"
    fa.write_text(">a first\nACG\nTNNACGT\n>b\nNNNN\n>c\nacgt\n")
    codes, starts = parse_fastx_native(str(fa))
    from megagta_tpu.io.fastx import parse_fastx_bytes

    # python path with names_needed=True skips the native parser
    f2, s2, names = parse_fastx_bytes(str(fa), names_needed=True)
    assert (codes == f2).all()
    assert (starts == s2).all()
    assert names == ["a", "b", "c"]


def test_native_fastq_gz(tmp_path):
    import gzip

    fq = tmp_path / "t.fq.gz"
    with gzip.open(fq, "wt") as f:
        f.write("@x\nACGTN\n+\nIIIII\n@y\nTTTT\n+\nIIII\n")
    codes, starts = parse_fastx_native(str(fq))
    assert list(starts) == [0, 4, 8]
    assert list(codes) == [0, 1, 2, 3, 3, 3, 3, 3]
