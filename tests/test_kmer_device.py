"""Device k-mer counting pipeline vs the host (numpy) builder path."""

import jax.numpy as jnp
import numpy as np
import pytest

from megagta_tpu.graph.builder import edges_from_reads
from megagta_tpu.ops.dna import pack_kmers
from megagta_tpu.ops.kmer_device import counted_kmers
from tests.synthetic import make_scenario
from tests.test_graph import make_package


@pytest.mark.parametrize("k1", [30, 45, 36])
def test_device_counts_match_host(k1):
    sc = make_scenario(seed=23, gene_aa_len=60, read_len=61, read_step=3)
    pkg = make_package(sc["reads"])
    padded, lens = pkg.padded()
    sk, run_start, valid = counted_kmers(
        jnp.asarray(padded), jnp.asarray(lens), k1
    )
    sk = np.asarray(sk)
    starts = np.flatnonzero(np.asarray(run_start) & np.asarray(valid))
    bounds = np.append(starts, int(np.asarray(valid).sum()))
    counts = np.diff(bounds)
    dev_keys = sk[starts]

    edges, mult = edges_from_reads(pkg, k1 - 1)
    host_keys = pack_kmers(edges, k1)  # [N, 2] uint64 big-endian

    # convert device 3x32 keys to the host uint64-word representation
    hi = (dev_keys[:, 0].astype(np.uint64) << np.uint64(32)) | dev_keys[:, 1].astype(np.uint64)
    lo = dev_keys[:, 2].astype(np.uint64) << np.uint64(32)
    if host_keys.shape[1] == 1:
        got = hi[:, None]
        assert (lo == 0).all()
    else:
        got = np.stack([hi, lo], axis=1)
    assert got.shape == host_keys.shape
    assert (got == host_keys).all()
    assert (counts == mult).all()
