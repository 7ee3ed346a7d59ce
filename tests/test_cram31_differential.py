"""CRAM 3.1 adversarial differential hardening (VERDICT r2 item 6).

No htscodecs/3.1 sample files exist in this environment, so the bitstream
layouts are spec-derived; the strongest available cross-check is
DIFFERENTIAL: python-encoder -> native-decoder AND native-encoder ->
python-decoder across randomized parameter corners, with blob parity
between the two encoders.  A layout divergence between the two independent
implementations of the same spec text would show up as a mismatch here.

Corners targeted (CRAMcodecs spec sections):
  - arith / rANSNx16: order-1 over SPARSE alphabets (1-3 symbols), RLE+PACK
    stacking, STRIPE, tiny inputs (0/1/3/4 bytes), 4-symbol pack nibbles
  - fqzcomp: selector edge cases (sel with 2 params, per-record reverse,
    dedup of adjacent identical records, in-stream lengths, max_sym
    boundary, single records, length-1 records)
  - tok3: DIGITS vs DIGITS0 boundaries (leading zeros, uint32 overflow
    digit runs, width changes), DUP/DIFF, MATCH/DDELTA transitions
"""

import numpy as np
import pytest

import hla_la_tpu.native as native
from hla_la_tpu.io import arith, fqzcomp, tok3
from hla_la_tpu.io import rans_nx16 as nx

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _python_only(fn, *a, **kw):
    avail = native.available
    try:
        native.available = lambda: False
        return fn(*a, **kw)
    finally:
        native.available = avail


def _differential(mod, data: bytes, **enc_kw):
    """Encode with both implementations (blob parity), decode each blob
    with both implementations (payload parity + round-trip)."""
    blob_native = mod.compress(data, **enc_kw)
    blob_py = _python_only(mod.compress, data, **enc_kw)
    assert blob_native == blob_py, (mod.__name__, enc_kw)
    got_native = mod.uncompress(blob_py, len(data))
    got_py = _python_only(mod.uncompress, blob_native, len(data))
    assert got_native == data, (mod.__name__, enc_kw)
    assert got_py == data, (mod.__name__, enc_kw)


def _corner_payloads(rng) -> list[bytes]:
    sparse1 = bytes([7]) * 700                          # 1-symbol alphabet
    sparse2 = bytes(rng.integers(0, 2, 900, dtype=np.uint8) * 200)
    sparse3 = bytes(rng.choice([3, 9, 250], 800).astype(np.uint8))
    nibbles = bytes(rng.integers(0, 4, 1200, dtype=np.uint8))   # PACK 2-bit
    rle_heavy = np.repeat(rng.integers(0, 5, 60, dtype=np.uint8),
                          rng.integers(1, 120, 60)).tobytes()
    dense = bytes(rng.integers(0, 256, 1500, dtype=np.uint8))
    order1_friendly = bytes((np.cumsum(rng.integers(0, 3, 1000))
                             % 7).astype(np.uint8))
    return [b"", b"\x05", b"abc", b"aaaa", sparse1, sparse2, sparse3,
            nibbles, rle_heavy, dense, order1_friendly]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_arith_corners(seed):
    rng = np.random.default_rng(1000 + seed)
    for data in _corner_payloads(rng):
        for order in (0, 1):
            for use_pack in (False, True):
                for use_rle in (False, True):
                    _differential(arith, data, order=order,
                                  use_pack=use_pack, use_rle=use_rle)
        _differential(arith, data, ext=True)
        if len(data) >= 4:
            _differential(arith, data, stripe=4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_ransnx16_corners(seed):
    rng = np.random.default_rng(2000 + seed)
    for data in _corner_payloads(rng):
        for order in (0, 1):
            for n32 in (False, True):
                for use_pack in (False, True):
                    for use_rle in (False, True):
                        _differential(nx, data, order=order, n32=n32,
                                      use_pack=use_pack, use_rle=use_rle)
        if len(data) >= 4:
            _differential(nx, data, stripe=4)


def _fqz_differential(data: bytes, lens, **kw):
    blob_native = fqzcomp.compress(data, lens, **kw)
    blob_py = _python_only(fqzcomp.compress, data, lens, **kw)
    assert blob_native == blob_py
    assert fqzcomp.uncompress(blob_py, len(data)) == data
    assert _python_only(fqzcomp.uncompress, blob_native,
                        len(data)) == data


@pytest.mark.parametrize("seed", [0, 1])
def test_differential_fqz_selector_edges(seed):
    from hla_la_tpu.io.fqzcomp import (PF_DO_DEDUP, PF_DO_LEN, PF_DO_SEL,
                                       PF_HAVE_QMAP)
    rng = np.random.default_rng(3000 + seed)

    # plain: single records, length-1 records, two records
    _fqz_differential(bytes([5]), [1])
    _fqz_differential(bytes(rng.integers(0, 40, 60, dtype=np.uint8)), [60])
    _fqz_differential(bytes(rng.integers(0, 8, 7, dtype=np.uint8)),
                      [3, 4])

    # max_sym boundary: qualities spanning a wide alphabet
    wide = bytes(rng.integers(0, 64, 50 * 64, dtype=np.uint8))
    _fqz_differential(wide, [64] * 50)

    # selectors with 2 params at context extremes, per-record reverse,
    # dedup of adjacent identical records, in-stream lengths
    n_rec, rl = 48, 72
    recs = [bytes(np.clip(np.cumsum(rng.integers(-2, 3, rl)) + 45, 33, 73)
                  .astype(np.uint8)) for _ in range(n_rec)]
    recs[7] = recs[6]
    recs[8] = recs[6]          # dedup RUN, not just one pair
    data = b"".join(recs)
    lens = [rl] * n_rec
    for cx0, cx1 in ((0, 11), (5, 0)):
        pms = []
        for cx in (cx0, cx1):
            pm = fqzcomp._default_params(data, lens)
            pm.pflags |= PF_DO_SEL | PF_DO_DEDUP | PF_DO_LEN
            pm.context = cx
            pms.append(pm)
        stab = np.zeros(256, dtype=np.int64)
        stab[1] = 1
        sels = [(i // 3) % 2 for i in range(n_rec)]
        revs = [i % 4 == 1 for i in range(n_rec)]
        _fqz_differential(data, lens, params=pms, sels=sels, stab=stab,
                          revs=revs)
    # all-reversed records
    pm = fqzcomp._default_params(data, lens)
    _fqz_differential(data, lens, params=[pm], revs=[True] * n_rec)


def _tok3_differential(names: list[bytes], use_arith: bool):
    data = b"\n".join(names) + b"\n"
    # tok3's inner streams route through arith/rans: native and python
    # inner codecs must agree blob-for-blob and decode each other
    blob_native = tok3.compress(data, use_arith=use_arith)
    blob_py = _python_only(tok3.compress, data, use_arith=use_arith)
    assert blob_native == blob_py
    assert tok3.uncompress(blob_py) == data
    assert _python_only(tok3.uncompress, blob_native) == data


@pytest.mark.parametrize("use_arith", [False, True])
def test_differential_tok3_digits0_boundaries(use_arith):
    # DIGITS0 (leading zeros), width changes, uint32-overflow digit runs,
    # DUP, DDELTA transitions, single-char names, all-digit names
    names = [
        b"read007", b"read008", b"read010",          # DIGITS0 + delta
        b"read0100", b"read0100",                    # width change + DUP
        b"r4294967295", b"r4294967296",              # u32 boundary
        b"r99999999999999999999",                    # > u64 digit run
        b"x", b"y",                                  # single char
        b"123", b"0123", b"00123",                   # all-digit, widths
        b"M0:1:FC:1:1101:1000:2000", b"M0:1:FC:1:1101:1000:2001",
        b"M0:1:FC:1:1101:1001:1999",                 # real-name shape
        b"a_b_c_1", b"a_b_c_2", b"a_b_d_0009",       # token type switch
    ]
    _tok3_differential(names, use_arith)
    # DUP of the entire previous name repeated many times
    _tok3_differential([b"dup"] * 30 + [b"dup0001"], use_arith)
    # names that are pure zero-padded increasing counters
    _tok3_differential([b"%08d" % i for i in range(50)], use_arith)
