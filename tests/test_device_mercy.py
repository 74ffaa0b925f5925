"""Device-engine mercy builds == the host mercy oracle (VERDICT r3 ask #6):
min_count=2 graphs built through build_sdbg_device with a solid mask must be
bit-identical to the host builder, on whole-array AND multi-batch streaming
paths, and the batched mercy mask itself must equal the whole-array mask."""

import numpy as np
import pytest

from megagta_tpu.graph.builder import build_sdbg
from megagta_tpu.graph.device_builder import build_sdbg_device
from megagta_tpu.graph.mercy import solid_windows_with_mercy
from tests.synthetic import make_scenario
from tests.test_device_builder import assert_sdbg_equal
from tests.test_graph import make_package


def _mercy_package(seed=7):
    """Mixed coverage: dense tiling plus sparse single-pass regions, so the
    mercy candidate/rescue machinery actually fires at min_count=2."""
    sc = make_scenario(seed=seed, gene_aa_len=60, read_len=70, read_step=2)
    sparse = make_scenario(seed=seed + 1, gene_aa_len=40, read_len=70,
                           read_step=31)
    return make_package(sc["reads"] + sc["reads"][:10] + sparse["reads"])


@pytest.mark.parametrize("batch", [None, 37])
def test_mercy_mask_batched_equals_whole(batch):
    pkg = _mercy_package()
    whole = solid_windows_with_mercy(pkg, 21, 2)
    got = solid_windows_with_mercy(pkg, 21, 2, batch_reads=batch)
    np.testing.assert_array_equal(whole, got)
    assert whole.any() and not whole.all(), "fixture exercises both states"


def test_device_mercy_build_matches_host():
    pkg = _mercy_package()
    solid = solid_windows_with_mercy(pkg, 21, 2)
    host = build_sdbg(pkg, 21, min_count=2, solid_mask=solid)
    dev = build_sdbg_device(pkg, 21, min_count=2, solid_mask=solid)
    assert_sdbg_equal(host, dev)


def test_device_mercy_build_streaming_multibatch():
    """>1-batch workload through the streaming device path (the VERDICT
    'done' criterion: min_count=2 oracle-equal via the device engine on a
    multi-batch build)."""
    pkg = _mercy_package(seed=11)
    solid = solid_windows_with_mercy(pkg, 21, 2, batch_reads=29)
    host = build_sdbg(pkg, 21, min_count=2, solid_mask=solid)
    dev = build_sdbg_device(
        pkg, 21, min_count=2, batch_reads=23, solid_mask=solid
    )
    assert_sdbg_equal(host, dev)


def test_device_assist_mask_always_solid():
    """Assist reads (trailing rows) count regardless of solidity when a
    mask rides along (s2 :276 semantics)."""
    sc = make_scenario(seed=3, gene_aa_len=40, read_len=60, read_step=3)
    assist = make_scenario(seed=4, gene_aa_len=30, read_len=60, read_step=25)
    pkg = make_package(sc["reads"] + assist["reads"])
    na = len(assist["reads"])
    solid = solid_windows_with_mercy(pkg, 21, 2, num_assist=na)
    host = build_sdbg(pkg, 21, min_count=2, solid_mask=solid, num_assist=na)
    dev = build_sdbg_device(
        pkg, 21, min_count=2, solid_mask=solid, num_assist=na
    )
    assert_sdbg_equal(host, dev)
