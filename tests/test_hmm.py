import math

import numpy as np

from megagta_tpu.constants import AA_ALPHABET
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm, write_hmm
from megagta_tpu.hmm.profile import DD, DM, IM, II, MD, MI, MM, NEG_INF
from megagta_tpu.models.build import build_hmm_tables


def random_hmm(tmp_path, L=25, seed=0):
    rng = np.random.default_rng(seed)
    A = 20
    mp = rng.dirichlet(np.ones(A) * 0.3, size=L + 1)
    mp[0] = 0
    ip = rng.dirichlet(np.ones(A), size=L + 1)
    tp = np.zeros((L + 1, 7))
    tp[:, 0:3] = rng.dirichlet([8, 1, 1], size=L + 1)
    tp[:, 3:5] = rng.dirichlet([3, 1], size=L + 1)
    tp[:, 5:7] = rng.dirichlet([3, 1], size=L + 1)
    compo = rng.dirichlet(np.ones(A))
    path = str(tmp_path / f"r{seed}.hmm")
    write_hmm(path, "test", mp, ip, tp, compo, AA_ALPHABET)
    return path, mp, ip, tp, compo


def test_parser_roundtrip(tmp_path):
    path, mp, ip, tp, compo = random_hmm(tmp_path)
    hmm = parse_hmm(path, normalized=True)
    L = mp.shape[0] - 1
    assert hmm.model_length == L
    assert hmm.alphabet_chars == AA_ALPHABET
    # normalized msc = log(p / compo)
    for k in (1, L // 2, L):
        for j in (0, 7, 19):
            # write/parse round-trips through %.5f text
            expect = math.log(mp[k, j] / compo[j]) if mp[k, j] > 0 else NEG_INF
            assert abs(hmm.msc[k, j] - expect) < 1e-4
    # insert scores all zero except final row = -inf
    assert (hmm.isc[:-1] == 0).all()
    assert (hmm.isc[-1] == NEG_INF).all()
    # transitions = log p
    assert abs(hmm.trans[3, MM] - math.log(tp[3, 0])) < 1e-4
    # mme = row max of msc
    assert np.allclose(hmm.mme[1:], hmm.msc[1:].max(axis=1), atol=1e-9)
    assert hmm.mme[0] == NEG_INF


def reference_heuristic(hmm, state, state_no):
    """Direct port of MostProbablePath::computeCostInternal
    (src/most_probable_path.h:48-118) for oracle comparison."""
    h = 0.0
    pre_state = state
    i = state_no + 1
    L = hmm.model_length
    best_match = hmm.msc.max(axis=1)
    while i <= L:
        if pre_state == "m":
            mt, it_, dt = hmm.trans[i - 1, MM], hmm.trans[i - 1, MI], hmm.trans[i - 1, MD]
        elif pre_state == "d":
            mt, it_, dt = hmm.trans[i - 1, DM], NEG_INF, hmm.trans[i - 1, DD]
        else:
            mt, it_, dt = hmm.trans[i - 1, IM], hmm.trans[i - 1, II], NEG_INF
        mme = hmm.max_match_emission(i)
        mt = mt + best_match[i] - mme
        dt = dt - mme
        it_ = NEG_INF
        if it_ > mt and it_ > dt:
            h += it_
            pre_state = "i"
            i -= 1
        elif dt > mt and dt > it_:
            h += dt
            pre_state = "d"
        else:
            h += mt
            pre_state = "m"
        i += 1
    return h


def test_heuristic_matches_reference_port(tmp_path):
    for seed in range(3):
        path, *_ = random_hmm(tmp_path, L=18, seed=seed)
        hmm = parse_hmm(path)
        h = heuristic_table(hmm)
        for v in range(hmm.model_length + 1):
            for si, state in enumerate("mid"):
                expect = reference_heuristic(hmm, state, v)
                assert abs(h[si, v] - expect) < 1e-9, (state, v)


def test_build_hmm_tables_valid():
    aligned = [
        "MKVLAT",
        "MKVLAT",
        "MRVLGT",
        "MKV-AT",
    ]
    mp, ip, tp, compo, cols = build_hmm_tables(aligned)
    L = len(cols)
    assert L == 6
    assert np.allclose(mp[1:].sum(axis=1), 1.0)
    assert np.allclose(tp[:, 0:3].sum(axis=1), 1.0)
    assert np.allclose(compo.sum(), 1.0)


def test_parse_real_hmmer3b_file():
    """Parse a verbatim hmmbuild-layout HMMER3/b file (ACC/DESC/GA/TC/NC/
    STATS header lines, MAP/CONS/RF annotation columns on match lines,
    '*' infinities in emission and transition rows) — the quirks the
    mini-hmmbuild writer (models/build.py) never produces. Field semantics
    mirrored from the reference parser (src/hmmer3b_parser.h:19-176)."""
    import math
    import os

    import numpy as np

    from megagta_tpu.hmm.heuristic import heuristic_table
    from megagta_tpu.hmm.parser import parse_hmm
    from megagta_tpu.hmm.profile import MD, MM, PROTEIN

    path = os.path.join(os.path.dirname(__file__), "data", "rplB_frag.hmm")
    hmm = parse_hmm(path)
    assert hmm.name == "rplB_frag"
    assert hmm.model_length == 4
    assert hmm.alphabet == PROTEIN
    assert hmm.alphabet_chars == "ACDEFGHIKLMNPQRSTVWY"
    assert hmm.version == "HMMER3/b"

    # COMPO normalization: msc = log(exp(-v) / compo[j])
    v, c = 3.16986, 2.59266  # state 1, 'A'
    assert math.isclose(
        hmm.msc[1, 0], math.log(math.exp(-v) / math.exp(-c)), rel_tol=1e-9
    )
    # '*' match emission ('G' in state 4) -> -inf
    assert np.isneginf(hmm.msc[4, 5])
    # annotation columns (MAP/CONS/RF) must not bleed into the floats
    assert np.isfinite(hmm.msc[1, 1:]).all()
    # insert emissions forced to 0 in normalized mode; final row -inf
    assert (hmm.isc[:4] == 0.0).all()
    assert np.isneginf(hmm.isc[4]).all()
    # '*' transitions -> -inf (m->d and d->d of the final node)
    assert np.isneginf(hmm.trans[4, MD])
    assert np.isfinite(hmm.trans[1, MM])
    # the heuristic precompute must accept the real file
    h = heuristic_table(hmm)
    assert h.shape == (3, 5) and np.isfinite(h[0, 1:]).any()
