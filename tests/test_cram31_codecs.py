"""CRAM 3.1 codec tests: adaptive arithmetic (method 6), fqzcomp quality
codec (method 7) and the tok3 name tokeniser (method 8) — round-trips over
every transform/flag combination, corrupt-stream hardening, and CRAM files
whose blocks use the new codecs decoding through the production reader
(HLA-LA.pl:221-229 accepts CRAM input; these codecs complete the 3.1 set
next to rANSNx16)."""

import itertools

import numpy as np
import pytest

from hla_la_tpu.io import arith, fqzcomp, tok3
from hla_la_tpu.io.bam import BamRecord, FLAG_PAIRED, FLAG_READ1, \
    FLAG_READ2, FLAG_REVERSE, FLAG_UNMAPPED
from hla_la_tpu.io.cram import CramReader
from hla_la_tpu.io.cram_write import write_cram
from hla_la_tpu.io.cram import M_ARITH, M_FQZ, M_TOK3


# ------------------------------------------------------------------ arith
def test_arith_round_trip(rng):
    """Every ORDER/PACK/RLE/EXT/STRIPE combination must round-trip."""
    cases = [b"", b"A", b"hello world " * 50,
             bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
             bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
             (b"A" * 300 + b"B" * 5 + b"C") * 20,
             bytes(rng.choice([65, 66, 67, 68], p=[.7, .2, .05, .05],
                              size=20000).astype(np.uint8))]
    for data in cases:
        for order, pack, rle, ext, stripe in itertools.product(
                (0, 1), (False, True), (False, True), (False, True),
                (0, 4)):
            blob = arith.compress(data, order=order, use_pack=pack,
                                  use_rle=rle, ext=ext, stripe=stripe)
            assert arith.uncompress(blob) == data
        blob = arith.compress(data, order=1, nosz=True)
        assert arith.uncompress(blob, len(data)) == data


def test_arith_compression_beats_raw(rng):
    """Adaptive order-0 coding must approach the source entropy."""
    data = bytes(rng.choice([65, 66, 67, 68], p=[.7, .2, .05, .05],
                            size=20000).astype(np.uint8))
    blob = arith.compress(data, order=0, use_pack=False)
    # entropy of (.7,.2,.05,.05) = 1.26 bits/sym -> ~3160 bytes
    assert len(blob) < 3500, len(blob)


def test_arith_range_coder_carry(rng):
    """Long runs of one symbol drive the carry/pending-0xFF path."""
    for n in (10, 1000, 65537):
        data = b"\xff" * n
        assert arith.uncompress(arith.compress(data, use_pack=False,
                                               use_rle=False)) == data


def test_arith_fuzz_no_crash(rng):
    """Corrupt arith blobs must raise cleanly (no crash, no huge alloc)."""
    base = arith.compress(bytes(rng.integers(0, 50, 3000,
                                             dtype=np.uint8)), order=1)
    for trial in range(300):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        try:
            out = arith.uncompress(bytes(blob))
            assert len(out) <= (1 << 28)
        except (ValueError, IndexError, OverflowError):
            pass
    for n in range(1, 24):   # truncations
        try:
            arith.uncompress(base[:n])
        except (ValueError, IndexError):
            pass


# ------------------------------------------------------------------- tok3
def test_tok3_round_trip(rng):
    names = [f"M01234:56:000000000-A1B2C:1:{lane}:{x}:{y}".encode()
             for lane in (1101, 1102)
             for x, y in zip(rng.integers(1000, 30000, 100),
                             rng.integers(1000, 30000, 100))]
    cases = [b"\n".join(names) + b"\n",
             b"\0".join(names) + b"\0",
             b"\n".join(names),
             b"read1\nread1\nread1\n",
             b"\n", b"",
             b"a\nab\nabc1\nabc2\nabc0003\nabc10000000000000009\n",
             b"x007\nx008\nx9\nx10\n",
             "ünïcode:123\nünïcode:124\n".encode()]
    for use_arith in (False, True):
        for data in cases:
            blob = tok3.compress(data, use_arith=use_arith)
            assert tok3.uncompress(blob) == data


def test_tok3_beats_gzip_on_sequential_names():
    import gzip
    names = [f"M01234:56:A1B2C:1:1101:{10000 + i}:{20000 + i * 3}".encode()
             for i in range(1000)]
    data = b"\n".join(names) + b"\n"
    blob = tok3.compress(data)
    assert tok3.uncompress(blob) == data
    assert len(blob) < len(gzip.compress(data)) / 3


def test_tok3_fuzz_no_crash(rng):
    names = [f"r{i}:{int(v)}".encode()
             for i, v in enumerate(rng.integers(0, 9999, 200))]
    base = tok3.compress(b"\n".join(names) + b"\n")
    for trial in range(300):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        try:
            out = tok3.uncompress(bytes(blob))
            assert len(out) <= (1 << 28)
        except (ValueError, IndexError, OverflowError):
            pass
    for n in range(1, 16):
        try:
            tok3.uncompress(base[:n])
        except (ValueError, IndexError):
            pass


# ---------------------------------------------------------------- fqzcomp
def _sim_quals(rng, n_reads, L):
    out, lens = [], []
    for _ in range(n_reads):
        q = np.clip(np.cumsum(rng.integers(-2, 3, L)) + 35, 2,
                    41).astype(np.uint8) + 33
        out.append(q.tobytes())
        lens.append(L)
    return b"".join(out), lens


def test_fqzcomp_round_trip(rng):
    data, lens = _sim_quals(rng, 300, 100)
    blob = fqzcomp.compress(data, lens)
    assert fqzcomp.uncompress(blob, len(data)) == data
    # varying lengths engage DO_LEN
    data2 = b"".join(bytes([33 + int(x) for x in rng.integers(0, 40, l)])
                     for l in (50, 70, 90))
    assert fqzcomp.uncompress(fqzcomp.compress(data2, [50, 70, 90]),
                              210) == data2
    # single record, no lens; constant qualities; empty block
    d3 = bytes([40]) * 1000
    assert fqzcomp.uncompress(fqzcomp.compress(d3), 1000) == d3
    assert fqzcomp.uncompress(fqzcomp.compress(b""), 0) == b""


def test_fqzcomp_beats_gzip_on_correlated_quals(rng):
    import gzip
    data, lens = _sim_quals(rng, 300, 100)
    blob = fqzcomp.compress(data, lens)
    assert len(blob) < len(gzip.compress(data)), \
        (len(blob), len(gzip.compress(data)))


def test_fqzcomp_multi_param_sel_rev_dedup(rng):
    """The selector/stab, per-record reverse and dedup layers round-trip."""
    from hla_la_tpu.io.fqzcomp import PF_DO_DEDUP, PF_DO_LEN, PF_DO_SEL
    data, lens = _sim_quals(rng, 10, 100)
    recs = [data[i * 100:(i + 1) * 100] for i in range(10)]
    recs[3] = recs[2]              # duplicate
    data = b"".join(recs)
    pms = []
    for ctx in (0, 7):
        pm = fqzcomp._default_params(data, lens)
        pm.pflags |= PF_DO_SEL | PF_DO_DEDUP | PF_DO_LEN
        pm.context = ctx
        pms.append(pm)
    sels = [i % 2 for i in range(10)]
    stab = np.zeros(256, dtype=np.int64)
    stab[1] = 1
    revs = [False] * 10
    revs[5] = True
    blob = fqzcomp.compress(data, lens, params=pms, sels=sels, stab=stab,
                            revs=revs)
    assert fqzcomp.uncompress(blob, len(data)) == data


def test_fqzcomp_rejects_zero_length_records():
    """The stream cannot represent empty records; the encoder must refuse
    instead of emitting an undecodable block."""
    with pytest.raises(ValueError, match="zero-length"):
        fqzcomp.compress(b"AAAABBBB", lens=[4, 0, 4])


def test_fqzcomp_fuzz_no_crash(rng):
    data, lens = _sim_quals(rng, 30, 80)
    base = fqzcomp.compress(data, lens)
    for trial in range(200):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        try:
            out = fqzcomp.uncompress(bytes(blob), len(data))
            assert len(out) == len(data)
        except (ValueError, IndexError, OverflowError):
            pass
    for n in range(1, 16):
        try:
            fqzcomp.uncompress(base[:n], len(data))
        except (ValueError, IndexError):
            pass


def test_native_encoders_blob_identical_to_python(rng):
    """The C++ encoders (hla_arith_encode / hla_fqz_encode /
    hla_ransnx16_encode) must produce blob-identical output to the Python
    encoders — the repo's byte-identical-optimisation discipline — so a
    decoder of either implementation reads either's output."""
    import hla_la_tpu.native as native
    from hla_la_tpu.io import rans_nx16 as nx
    from hla_la_tpu.io.fqzcomp import PF_DO_DEDUP, PF_DO_LEN, PF_DO_SEL
    if not native.available():
        pytest.skip("native library not built")
    avail = native.available

    def python_only(fn, *a, **kw):
        try:
            native.available = lambda: False
            return fn(*a, **kw)
        finally:
            native.available = avail

    cases = [bytes(rng.integers(0, 50, 3000, dtype=np.uint8)),
             np.repeat(rng.integers(60, 70, 120, dtype=np.uint8),
                       rng.integers(1, 40, 120)).tobytes(),
             b"", b"A" * 9]
    for d in cases:
        for order in (0, 1):
            for rle in (False, True):
                got = arith.compress(d, order=order, use_rle=rle)
                assert got == python_only(arith.compress, d, order=order,
                                          use_rle=rle)
            for n32 in (False, True):
                got = nx.compress(d, order=order, n32=n32)
                assert got == python_only(nx.compress, d, order=order,
                                          n32=n32)
    data, lens = _sim_quals(rng, 40, 80)
    assert fqzcomp.compress(data, lens) == python_only(
        fqzcomp.compress, data, lens)
    # the multi-param/selector/reverse/dedup layers too
    recs = [data[i * 80:(i + 1) * 80] for i in range(40)]
    recs[3] = recs[2]
    data2 = b"".join(recs)
    pms = []
    for cx in (0, 5):
        pm = fqzcomp._default_params(data2, lens)
        pm.pflags |= PF_DO_SEL | PF_DO_DEDUP | PF_DO_LEN
        pm.context = cx
        pms.append(pm)
    stab = np.zeros(256, dtype=np.int64)
    stab[1] = 1
    sels = [i % 2 for i in range(40)]
    revs = [i % 5 == 0 for i in range(40)]
    kw = dict(params=pms, sels=sels, stab=stab, revs=revs)
    assert fqzcomp.compress(data2, lens, **kw) == python_only(
        fqzcomp.compress, data2, lens, **kw)


def test_arith_fqz_native_python_parity(rng):
    """The C++ decoders (hla_arith_decode / hla_fqz_decode) must produce
    byte-identical output to the pure-Python decode on the same blobs."""
    import hla_la_tpu.native as native
    if not native.available():
        pytest.skip("native library not built")
    a_cases = [bytes(rng.integers(0, 50, 4000, dtype=np.uint8)),
               np.repeat(rng.integers(60, 70, 100, dtype=np.uint8),
                         rng.integers(1, 50, 100)).tobytes()]
    f_data, f_lens = _sim_quals(rng, 100, 90)
    blobs = []
    for d in a_cases:
        for order in (0, 1):
            for rle in (False, True):
                blobs.append(("arith", arith.compress(
                    d, order=order, use_rle=rle, use_pack=False), d))
    blobs.append(("fqz", fqzcomp.compress(f_data, f_lens), f_data))
    avail = native.available
    for kind, blob, want in blobs:
        mod = arith if kind == "arith" else fqzcomp
        got_native = mod.uncompress(blob, len(want))
        try:
            native.available = lambda: False
            got_py = mod.uncompress(blob, len(want))
        finally:
            native.available = avail
        assert got_native == got_py == want, kind


# -------------------------------------------------- CRAM files using them
@pytest.fixture
def world31(rng):
    ref = {"c1": "".join(rng.choice(list("ACGT"), 4000))}
    contigs = [("c1", 4000)]
    recs = []
    for i in range(60):
        pos = 50 + i * 40
        L = 70
        s = list(ref["c1"][pos:pos + L])
        s[int(rng.integers(0, L))] = "N"
        qual = "".join(chr(int(q)) for q in np.clip(
            np.cumsum(rng.integers(-2, 3, L)) + 60, 35, 74))
        recs.append(BamRecord(name=f"M0:1:FC:1:1101:{1000 + i}:{2000 + i}",
                              flag=FLAG_PAIRED | (FLAG_READ1 if i % 2 == 0
                                                  else FLAG_READ2),
                              ref_id=0, pos=pos, mapq=60,
                              cigar=[(L, 0)], seq="".join(s), qual=qual))
    recs.append(BamRecord(name="u1", flag=FLAG_UNMAPPED, ref_id=-1, pos=-1,
                          mapq=0, cigar=[], seq="ACGTACGTAC",
                          qual="IIIIIIIIII"))
    return ref, contigs, recs


def test_cram_with_31_codecs(tmp_path, world31):
    """A CRAM whose generic blocks use arith, quality block uses fqzcomp
    and name block uses tok3 must decode identically through CramReader."""
    ref, contigs, recs = world31
    path = str(tmp_path / "t31.cram")
    write_cram(path, contigs, recs, ref, method=M_ARITH,
               qual_method=M_FQZ, name_method=M_TOK3)
    got = list(CramReader(path, reference=ref))
    assert len(got) == len(recs)
    for orig, dec in zip(recs, got):
        assert (dec.name, dec.seq, dec.qual, dec.pos, dec.ref_id) == \
            (orig.name, orig.seq, orig.qual, orig.pos, orig.ref_id)
        for bit in (FLAG_PAIRED, FLAG_READ1, FLAG_READ2, FLAG_REVERSE,
                    FLAG_UNMAPPED):
            assert bool(dec.flag & bit) == bool(orig.flag & bit)


def test_cram_31_codecs_through_extract_reads(tmp_path, world31):
    """The production extraction path accepts a 3.1-codec CRAM."""
    from hla_la_tpu.io.bam import extract_reads
    ref, contigs, recs = world31
    path = str(tmp_path / "t31b.cram")
    write_cram(path, contigs, recs, ref, method=M_ARITH,
               qual_method=M_FQZ, name_method=M_TOK3)
    by_name, _ = extract_reads(path, regions=[("c1", 0, 4000)],
                               include_unmapped=True, cram_reference=ref)
    assert "u1" in by_name
    assert len(by_name) == len({r.name for r in recs})


def test_fqzcomp_rejects_out_of_range_codes():
    """With qmap=None, quality bytes >= max_sym are unencodable: compress
    must raise instead of letting the native encoder index past the model
    row (heap corruption) or the Python model raise IndexError."""
    pm = fqzcomp._default_params(b"\x00\x01\x02\x03" * 8, [32])
    pm.pflags &= ~fqzcomp.PF_HAVE_QMAP
    pm.qmap = None
    pm.max_sym = 4
    with pytest.raises(ValueError, match="outside qmap"):
        fqzcomp.compress(b"\xc8" * 32, [32], params=[pm])


def test_arith_ext_bomb_bounded():
    """A bz2 payload expanding far past the declared size must raise
    without allocating the full expansion (bounded decompressor)."""
    import bz2
    bomb = bz2.compress(b"\x00" * (64 << 20))   # 64MB of zeros -> ~2KB
    blob = bytearray()
    blob.append(arith.F_EXT)
    from hla_la_tpu.io.rans_nx16 import write_uint7
    write_uint7(1000, blob)                      # claimed raw size
    blob += bomb
    with pytest.raises(ValueError, match="arith EXT"):
        arith.uncompress(bytes(blob))


def test_cram31_golden_bitstreams():
    """Frozen compressed blobs must keep decoding AND today's encoders
    must still emit exactly these bytes — guards the on-disk bitstreams
    of all three 3.1 codecs against silent format drift (same discipline
    as the rANSNx16 golden)."""
    data = bytes(range(8)) * 40 + b"AAAAABBBCC" * 13
    a0 = bytes.fromhex(
        "0083420000101c95cb808e694d6e3eed3d1d3fb2f511d6159248b1dd33cc22"
        "b0dad80252fccb4e2a9e96bf64d0bb36ee6d32bafe4b13b775d29d992df698"
        "7afb4df26a04bb68fbb7ddb057cb05290825934c7855c083451d067d7f7b35"
        "f0c0e203cfc83e01da0994f853eaf62c5df8bfb0767eeb91e0e73cdddc85b5"
        "b7c131ec4eaa3bf13b2ff23b0032cd11899e7c27b9e9c46d8c83f23d2f3e4c"
        "480f365b58cf7e657f5c84fe1ab57236b243580253e43b8f8a50e5f6ebf159"
        "e1a957d68863c53ad6a9ef386371206a882b7c084ea8ca9fc07db9410a3dba"
        "76f0")
    a1 = bytes.fromhex(
        "418342000000100001d1e4b2d693c874ba55ac369690e3a914cbf31a40fe76"
        "dbc21273157fc9b3179635c2ea5c983e14415189b54b585b7c50c88e46e1f1"
        "4e093a7da61ba40e60b0e6853e4ee2cb0aa4c5bf9a167f7391cfeaea2863b2"
        "32b896c60b1e030d19466bb85af38eb1f650fe9030535287c817662af6f897"
        "77180d5796d912f86c709602578685")
    assert arith.uncompress(a0) == data
    assert arith.uncompress(a1) == data
    assert arith.compress(data, order=0, use_pack=False) == a0
    assert arith.compress(data, order=1, use_rle=True, use_pack=False) == a1

    quals = bytes([33 + (i * 7) % 40 for i in range(300)])
    fq = bytes.fromhex(
        "050000007028c60fcf2122232425262728292a2b2c2d2e2f30313233343536"
        "3738393a3b3c3d3e3f404142434445464748004001400240034004400540064"
        "00784400020012002200381200063ffff9c012d9cad1f617e109f2b38d538d1"
        "93ef96afbb8967c349dab16847c12e5fc94d1b8e5d041d315663bbf713cbad8"
        "db06db68834b2054f83fa6770de33642232fb5af48b65d8e10f7af4606e0e20"
        "69fe7bfd865bcd0e2120f611c0fd4c614a8f87911a184eae7602d4c38e7c988"
        "5a36d4f2ae31e1e3cb681d9717cb5")
    assert fqzcomp.uncompress(fq, 300) == quals
    assert fqzcomp.compress(quals, [100, 100, 100]) == fq

    names = b"r1:100\nr1:101\nr1:103\nzz9\nzz9\n"
    t3 = bytes.fromhex(
        "1d0502008007200506060606058006200402090901010520037a7a00020320"
        "0172800620040709090807062004010000000803200108800620040209090a"
        "020320013a800520030708080706200464000000080420020102800520030a"
        "0909")
    assert tok3.uncompress(t3) == names
    assert tok3.compress(names) == t3
