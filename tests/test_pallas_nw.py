"""Pallas NW kernel vs the numpy reference: identical scores/ends, and
identical backtraces for alignable reads (pointer bits may differ only in
unreachable NEG cells — mid-window ref pads never occur in real windows)."""

import numpy as np
import pytest

from hla_la_tpu.ops.banded_nw import banded_nw_backtrace, banded_nw_forward
from hla_la_tpu.ops.pallas_nw import make_pallas_banded_nw


def _world(rng, B=40, L=24, W=16):
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    refs = rng.integers(0, 4, (B, L + W)).astype(np.uint8)
    for b in range(0, B, 3):   # realistic suffix-only ref pads
        cut = int(rng.integers(L // 2, L + W))
        refs[b, cut:] = 4
    lens = rng.integers(4, L + 1, B).astype(np.int64)
    return reads, refs, lens


def test_pallas_nw_matches_numpy(rng):
    B, L, W = 40, 24, 16
    reads, refs, lens = _world(rng, B, L, W)
    want = banded_nw_forward(reads, lens, refs, use_native=False)
    fwd = make_pallas_banded_nw(L, W, interpret=True, tb=8)
    got = tuple(np.asarray(x) for x in fwd(reads, lens, refs))
    ok = want[0] > -1e29
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6)
    np.testing.assert_array_equal(got[1][ok], want[1][ok])
    np.testing.assert_array_equal(got[2][ok], want[2][ok])
    # backtraces must agree wherever an alignment exists
    for b in np.nonzero(ok)[0]:
        ops_a = banded_nw_backtrace(got[3][b], int(lens[b]), int(got[1][b]),
                                    int(got[2][b]))
        ops_b = banded_nw_backtrace(want[3][b], int(lens[b]), int(want[1][b]),
                                    int(want[2][b]))
        assert ops_a == ops_b, b


def test_pallas_nw_uneven_batch(rng):
    # batch not a multiple of the lane tile
    B, L, W = 13, 16, 8
    reads, refs, lens = _world(rng, B, L, W)
    want = banded_nw_forward(reads, lens, refs, use_native=False)
    fwd = make_pallas_banded_nw(L, W, interpret=True, tb=8)
    got = tuple(np.asarray(x) for x in fwd(reads, lens, refs))
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6)
    assert got[3].shape == want[3].shape


def test_pallas_nw_n_bases_parity(rng):
    """Reads/refs containing N (code 4) mid-sequence: the segmented cummax
    must not let deletion chains cross masked reference positions
    (regression: the unsegmented closed form diverged from the sequential
    recurrence on N-containing references)."""
    import numpy as np

    from hla_la_tpu.ops.banded_nw import banded_nw_forward
    from hla_la_tpu.ops.pallas_nw import make_pallas_banded_nw

    Bk, Lk, Wk = 96, 64, 16
    reads = rng.integers(0, 5, (Bk, Lk)).astype(np.uint8)
    refs = rng.integers(0, 5, (Bk, Lk + Wk)).astype(np.uint8)
    lens = rng.integers(20, Lk + 1, Bk).astype(np.int64)
    nw = make_pallas_banded_nw(Lk, Wk, interpret=True)
    s_j, k_j, st_j, p_j = (np.asarray(x) for x in nw(reads, lens, refs))
    s_p, k_p, st_p, p_p = banded_nw_forward(reads, lens, refs,
                                            use_native=False)
    assert np.allclose(s_j, s_p, atol=1e-4)
    # fully-unalignable rows (score ~ NEG) have arbitrary tie-broken
    # end cells across implementations; production discards them
    # (aligner: scores <= -1e29 -> None)
    live = s_p > -1e29
    assert (k_j == k_p)[live].all() and (st_j == st_p)[live].all()
    assert (p_j == p_p)[live].all()


def test_long_read_kernel_parity():
    """The row-chunked long-read kernel (make_pallas_banded_nw_long) must
    match the reference forward exactly — scores, end_k/state, pointer
    bits — incl. N bases, masked ref positions, an empty read, and lane
    ends spread across row chunks.  Runs in interpret mode (the real-chip
    record lives in docs/ROADMAP.md round 5)."""
    import numpy as np

    from hla_la_tpu.ops.banded_nw import banded_nw_forward
    from hla_la_tpu.ops.pallas_nw import make_pallas_banded_nw_long

    rng = np.random.default_rng(5)
    L, W, RC = 64, 16, 16
    B = 7
    refs = rng.integers(0, 4, (B, L + W)).astype(np.uint8)
    reads = np.empty((B, L), np.uint8)
    lens = rng.integers(L // 2, L + 1, B).astype(np.int64)
    for b in range(B):
        pos = W // 2
        out = []
        while len(out) < L and pos < L + W - 1:
            r = rng.random()
            if r < 0.05:
                pos += 1
                continue
            if r < 0.1:
                out.append(rng.integers(0, 4))
                continue
            c = refs[b, pos]
            if rng.random() < 0.05:
                c = (c + 1) % 4
            out.append(c)
            pos += 1
        while len(out) < L:
            out.append(0)
        reads[b] = out
    reads[0, 10:13] = 5     # N bases in the read
    refs[2, 20:24] = 4      # masked ref positions (unalignable wall)
    lens[3] = 0             # empty read

    fwd = make_pallas_banded_nw_long(L, W, rc=RC, interpret=True)
    got = fwd(reads, lens, refs)
    want = banded_nw_forward(reads, lens, refs, use_native=False)
    assert np.allclose(np.asarray(got[0]),
                       np.asarray(want[0]).astype(np.float32), atol=1e-4)
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))
    assert np.array_equal(np.asarray(got[2]), np.asarray(want[2]))
    assert np.array_equal(np.asarray(got[3]), np.asarray(want[3]))
