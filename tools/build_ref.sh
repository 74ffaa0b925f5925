#!/bin/bash
# Build the C++ reference binary into .ref_build/ so the oracle tests
# (tests/test_reference_oracle.py) and bench.py's live baseline measurement
# can run. The reference source tree is copied (never modified in place:
# /root/reference is read-only) and patched minimally for modern g++:
# megahit_kmer.h binds packed fields to references (std::swap /
# ReverseComplement(word_t&)), which g++ >= 9 rejects.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${1:-/root/reference}"
DST="$REPO/.ref_build"

if [ -x "$DST/src/megagta" ]; then
    echo "already built: $DST/src/megagta"
    exit 0
fi
mkdir -p "$DST"
cp -r "$REF/src" "$DST/src"
python3 - "$DST/src/megahit_kmer.h" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
s = s.replace(
    """        for (unsigned i = 0; i < used_words; ++i)
            bit_operation::ReverseComplement(data_[i]);""",
    """        for (unsigned i = 0; i < used_words; ++i) {
            word_t tmp = data_[i];
            bit_operation::ReverseComplement(tmp);
            data_[i] = tmp;
        }""")
s = s.replace(
    """        for (unsigned i = 0; i < (used_words >> 1); ++i)
            std::swap(data_[i], data_[used_words - 1 - i]);""",
    """        for (unsigned i = 0; i < (used_words >> 1); ++i) {
            word_t tmp = data_[i];
            data_[i] = data_[used_words - 1 - i];
            data_[used_words - 1 - i] = tmp;
        }""")
open(p, "w").write(s)
EOF
make -C "$DST/src" -j"$(nproc)"
echo "built: $DST/src/megagta"
