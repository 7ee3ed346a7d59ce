"""CRAM 3.0 codec tests: rANS block codec, container/encoding round-trips,
reference-based reconstruction, mates, multi-slice, and CRAM input through
extract_reads and the full CLI (HLA-LA.pl:221-229 accepts BAM or CRAM)."""

import os

import numpy as np
import pytest

from hla_la_tpu.io import rans
from hla_la_tpu.io.bam import (BamRecord, extract_reads, FLAG_PAIRED,
                               FLAG_READ1, FLAG_READ2, FLAG_REVERSE,
                               FLAG_UNMAPPED)
from hla_la_tpu.io.cram import CramReader, read_itf8, read_ltf8, write_itf8, \
    write_ltf8
from hla_la_tpu.io.cram_write import write_cram, M_GZIP, M_RANS4x8, \
    M_RANSNx16


def test_itf8_ltf8_round_trip():
    for v in (0, 1, 127, 128, 255, 16383, 16384, (1 << 21) - 1, 1 << 21,
              (1 << 28) - 1, 1 << 28, (1 << 31) - 1, -1, -100, -(1 << 31)):
        buf = write_itf8(v)
        got, pos = read_itf8(buf, 0)
        assert got == v and pos == len(buf), v
    for v in (0, 127, 128, (1 << 14) - 1, 1 << 20, 1 << 35, (1 << 56) - 1,
              1 << 56, (1 << 63) - 1):
        buf = write_ltf8(v)
        got, pos = read_ltf8(buf, 0)
        assert got == v and pos == len(buf), v


def test_rans_round_trip(rng):
    cases = [b"", b"A", b"AAAA" * 100,
             bytes(rng.integers(0, 256, 10000, dtype=np.uint8)),
             bytes(rng.choice([65, 67, 71, 84], 33333).astype(np.uint8)),
             bytes(rng.integers(33, 75, 4097, dtype=np.uint8))]
    for order in (0, 1):
        for data in cases:
            assert rans.uncompress(rans.compress(data, order)) == data


def test_rans_nx16_round_trip(rng):
    """CRAM 3.1 rANSNx16: order 0/1, 4/32 states, PACK, RLE, STRIPE, CAT,
    NOSZ — every transform combination must round-trip."""
    from hla_la_tpu.io import rans_nx16 as nx

    cases = [b"", b"A", b"AB", b"AAAA" * 200,
             bytes(rng.integers(0, 256, 9973, dtype=np.uint8)),
             bytes(rng.choice([65, 67, 71, 84], 20001).astype(np.uint8)),
             bytes(rng.choice([0, 1], 5000, p=[0.9, 0.1]).astype(np.uint8)),
             bytes(np.repeat(rng.integers(60, 70, 300, dtype=np.uint8),
                             rng.integers(1, 40, 300)).tobytes()),
             bytes(rng.integers(33, 75, 4097, dtype=np.uint8))]
    for data in cases:
        for order in (0, 1):
            for n32 in (False, True):
                for use_rle in (False, True):
                    blob = nx.compress(data, order=order, n32=n32,
                                       use_rle=use_rle)
                    assert nx.uncompress(blob) == data, \
                        (len(data), order, n32, use_rle)
        # stripe + nosz
        blob = nx.compress(data, order=1, stripe=4)
        assert nx.uncompress(blob) == data
        blob = nx.compress(data, order=0, nosz=True)
        assert nx.uncompress(blob, len(data)) == data
        blob = nx.compress(data, cat=True)
        assert nx.uncompress(blob) == data

    # native payload decoder must agree with the pure-Python decode
    import hla_la_tpu.native as native
    if native.available():
        avail = native.available
        try:
            for data in cases:
                for order in (0, 1):
                    blob = nx.compress(data, order=order, use_pack=False)
                    nat = nx.uncompress(blob)
                    native.available = lambda: False
                    py = nx.uncompress(blob)
                    native.available = avail
                    assert nat == py == data, (len(data), order)
        finally:
            native.available = avail

    # uint7 round trip
    out = bytearray()
    vals = [0, 1, 127, 128, 16383, 16384, 1 << 30, (1 << 35) + 7]
    for v in vals:
        nx.write_uint7(v, out)
    pos = 0
    for v in vals:
        got, pos = nx.read_uint7(out, pos)
        assert got == v


def test_rans_nx16_golden_bitstream():
    """Frozen compressed blobs must keep decoding: guards the on-disk
    bitstream (CRAM files written with this codec today must stay
    readable after any refactor)."""
    from hla_la_tpu.io import rans_nx16 as nx

    data = bytes(range(8)) * 40 + b"AAAAABBBCC" * 13
    golden_o0 = bytes.fromhex(
        "8083420b000102030405060741424381611032547688989900aa00855b8558"
        "855885588359816c816c816cbb5002003dc4932d4866c45f382a85626bc2d9"
        "23fc37c468ef20b423d246d06a3fd1aa93f60789e97942488490460af9e471"
        "b0d5f50696a9fa601f14e5654e5b25dc0aeca61dc21ecc2f38ae2f9f138df2"
        "cbcaeff70c917c673d")
    golden_o1 = bytes.fromhex(
        "c583423b0241420402040204020402040204020402040204020402040204020"
        "40282740b0001020304050607414243813ac137430004103254767c88989fa0"
        "00aa0097363d3d3d3d3d3d81743d3d82313dce99240029fc9e0750bc25007b6"
        "c4e001630f46dfa09958d182de0030200e0070200e00b0200e00f0200e00302"
        "00e0070200e00b0200e00f0200e0030200e0070200e00b0200e00f0200e0030"
        "200e0070200e00b0200e00f0200e0030200e0070200e00b0200e00f0200e003"
        "0200e0070200e00b0200e00f0200e0030200e0070200e00b0200e00f0200e00"
        "30200e0070200e00b0200e04f4400")
    assert nx.uncompress(golden_o0) == data
    assert nx.uncompress(golden_o1) == data
    # and today's encoder still emits exactly these bytes
    assert nx.compress(data, order=0) == golden_o0
    assert nx.compress(data, order=1, n32=True, use_rle=True) == golden_o1


def test_rans_nx16_fuzz_no_crash(rng):
    """Corrupt rANSNx16 blobs must raise cleanly (no crash, no unbounded
    allocation): bit flips and truncations over an order-1 block."""
    from hla_la_tpu.io import rans_nx16 as nx

    good = nx.compress(bytes(rng.integers(0, 256, 4000, dtype=np.uint8)),
                       order=1)
    for _ in range(150):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            nx.uncompress(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(good), 53):
        try:
            nx.uncompress(good[:cut])
        except (ValueError, IndexError, NotImplementedError):
            pass


@pytest.fixture
def world(rng):
    ref = {"c1": "".join(rng.choice(list("ACGT"), 5000)),
           "c2": "".join(rng.choice(list("ACGT"), 3000))}
    contigs = [("c1", 5000), ("c2", 3000)]

    def mk(name, rid, pos, L=60, muts=2, flag=0, cigar=None, seq=None,
           qual=None):
        if seq is None:
            s = list(ref[contigs[rid][0]][pos:pos + L])
            for _ in range(muts):
                i = int(rng.integers(0, L))
                s[i] = "ACGT"[("ACGT".index(s[i]) + 1) % 4]
            seq = "".join(s)
        if qual is None:
            qual = "".join(chr(int(q)) for q in rng.integers(35, 70,
                                                             len(seq)))
        return BamRecord(name=name, flag=flag, ref_id=rid, pos=pos, mapq=60,
                         cigar=cigar or [(len(seq), 0)], seq=seq, qual=qual)

    recs = [mk("r1", 0, 100)]
    recs += [mk("p1", 0, 200, flag=FLAG_PAIRED | FLAG_READ1),
             mk("p1", 0, 500, flag=FLAG_PAIRED | FLAG_READ2 | FLAG_REVERSE)]
    # indels + softclip + N base (forces a 'B' feature)
    seq = (ref["c1"][800:820] + "TTTT" + ref["c1"][820:840]
           + ref["c1"][845:860] + "N" + "GGGG")
    recs.append(mk("indel", 0, 800,
                   cigar=[(20, 0), (4, 1), (20, 0), (5, 2), (16, 0), (4, 4)],
                   seq=seq))
    recs.append(BamRecord(name="u1", flag=FLAG_UNMAPPED, ref_id=-1, pos=-1,
                          mapq=0, cigar=[], seq="ACGTACGTAC",
                          qual="IIIIIIIIII"))
    recs.append(mk("on_c2", 1, 50))
    return ref, contigs, recs


@pytest.mark.parametrize("method", [M_GZIP, M_RANS4x8, M_RANSNx16])
def test_cram_round_trip(tmp_path, world, method):
    ref, contigs, recs = world
    path = str(tmp_path / "t.cram")
    write_cram(path, contigs, recs, ref, method=method)
    rd = CramReader(path, reference=ref)
    got = list(rd)
    assert len(got) == len(recs)
    for orig, dec in zip(recs, got):
        assert (dec.name, dec.seq, dec.qual, dec.pos, dec.ref_id,
                dec.mapq) == (orig.name, orig.seq, orig.qual, orig.pos,
                              orig.ref_id, orig.mapq)
        if not (orig.flag & FLAG_UNMAPPED):
            assert dec.cigar == orig.cigar
        # per-record flags preserved (mate bits may be patched on)
        for bit in (FLAG_PAIRED, FLAG_READ1, FLAG_READ2, FLAG_REVERSE,
                    FLAG_UNMAPPED):
            assert bool(dec.flag & bit) == bool(orig.flag & bit)


def test_cram_embedded_reference(tmp_path, world, rng):
    """Slices with an embedded reference decode with reference=None."""
    ref, contigs, _ = world
    recs = []
    for i in range(40):
        pos = 100 + i * 30
        s = list(ref["c1"][pos:pos + 50])
        s[int(rng.integers(0, 50))] = "N"
        recs.append(BamRecord(name=f"e{i}", flag=0, ref_id=0, pos=pos,
                              mapq=30, cigar=[(50, 0)], seq="".join(s),
                              qual="H" * 50))
    path = str(tmp_path / "emb.cram")
    write_cram(path, contigs, recs, ref, embed_reference=True)
    got = list(CramReader(path, reference=None))
    assert [r.seq for r in got] == [r.seq for r in recs]


def test_cram_requires_reference(tmp_path, world):
    ref, contigs, recs = world
    path = str(tmp_path / "t.cram")
    write_cram(path, contigs, recs, ref)
    with pytest.raises(ValueError, match="reference"):
        list(CramReader(path, reference=None))


def test_cram_multi_slice_and_extract(tmp_path, world):
    """Records split across multiple slices/containers; extraction filters
    regions exactly like the BAM path."""
    ref, contigs, _ = world
    recs = []
    for i in range(100):
        pos = 10 + i * 40
        rid = 0 if pos + 60 < 5000 else 1
        if rid == 1:
            pos = pos % 2000
        recs.append(BamRecord(name=f"m{i}", flag=0, ref_id=rid, pos=pos,
                              mapq=60, cigar=[(60, 0)],
                              seq=ref[contigs[rid][0]][pos:pos + 60],
                              qual="I" * 60))
    path = str(tmp_path / "ms.cram")
    write_cram(path, contigs, recs, ref, per_slice=17)
    got = list(CramReader(path, reference=ref))
    assert len(got) == 100
    assert [r.name for r in got] == [r.name for r in recs]
    # region extraction via the shared entry point
    by_name, cts = extract_reads(path, [("c1", 0, 1000)],
                                 include_unmapped=False, cram_reference=ref)
    names = set(by_name)
    want = {r.name for r in recs
            if r.ref_id == 0 and r.pos < 1000 and r.pos + 60 > 0}
    assert names == want
    assert cts == dict(contigs)


def test_cram_through_cli(tmp_path, rng, capsys):
    """Full HLA action with CRAM input + --ref (the HLA-LA.pl contract)."""
    from hla_la_tpu.cli import main
    from hla_la_tpu.io.fasta import write_fasta
    from hla_la_tpu.sim.graph_sim import simulate_prg_package
    from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp

    sim = simulate_prg_package(rng, backbone_length=1800, n_haplotypes=4)
    pkg_dir = str(tmp_path / "g")
    sim.write_package(pkg_dir)
    contig_len = 100000
    with open(os.path.join(pkg_dir, "knownReferences", "fake.txt"),
              "w") as fh:
        fh.write("contigID\tcontigLength\tExtractCompleteContig\t"
                 "PartialExtraction_Start\tPartialExtraction_Stop\n")
        fh.write(f"chr6\t{contig_len}\t1\t\t\n")

    # fake genome for chr6: random bases (reads are stored verbatim via
    # substitution/B features against it)
    genome = {"chr6": "".join(rng.choice(list("ACGT"), contig_len))}
    ref_fa = str(tmp_path / "genome.fa")
    write_fasta(ref_fa, genome)

    rs = ReadSimulator(rng, read_length=90, fragment_mean=300,
                       fragment_sd=25)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 8.0,
                                               name_prefix=f"h{h}")
    recs = []
    for i, p in enumerate(pairs):
        for mate_flag, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
            seq, qual = r.seq, r.qual
            flag = FLAG_PAIRED | mate_flag
            if r.reverse:
                seq, qual, flag = revcomp(seq), qual[::-1], \
                    flag | FLAG_REVERSE
            recs.append(BamRecord(name=r.name, flag=flag, ref_id=0,
                                  pos=1000 + i * 3, mapq=60,
                                  cigar=[(len(seq), 0)], seq=seq,
                                  qual=qual))
    cram_path = str(tmp_path / "in.cram")
    write_cram(cram_path, [("chr6", contig_len)], recs, genome,
               per_slice=500, method=M_RANS4x8)

    wd = str(tmp_path / "wd")
    rc = main(["--action", "HLA", "--BAM", cram_path, "--graph", pkg_dir,
               "--sampleID", "S", "--workingDir", wd, "--ref", ref_fa])
    assert rc == 0
    best = open(os.path.join(wd, "S", "hla", "R1_bestguess.txt")).read()
    assert "A*02:01" in best and "A*03:01" in best


def test_cram_mate_fields_and_tlen(tmp_path, world):
    """CRAM records carry RNEXT/PNEXT/TLEN after decode — both for
    attached (NF) and detached (MF/NS/NP/TS) mates — so TLEN-based insert
    estimation works on CRAM input (r2 review finding 1)."""
    ref, contigs, _ = world
    recs = []
    # attached pair (adjacent, same name)
    for name, pos, flag in (("p", 100, FLAG_PAIRED | FLAG_READ1),
                            ("p", 400, FLAG_PAIRED | FLAG_READ2
                             | FLAG_REVERSE)):
        recs.append(BamRecord(name=name, flag=flag, ref_id=0, pos=pos,
                              mapq=60, cigar=[(60, 0)],
                              seq=ref["c1"][pos:pos + 60], qual="I" * 60))
    # detached mate with explicit TLEN
    recs.append(BamRecord(name="d", flag=FLAG_PAIRED | FLAG_READ1,
                          ref_id=0, pos=900, mapq=60, cigar=[(60, 0)],
                          seq=ref["c1"][900:960], qual="I" * 60,
                          mate_ref_id=0, mate_pos=1200, tlen=360))
    path = str(tmp_path / "m.cram")
    write_cram(path, contigs, recs, ref)
    got = {(r.name, bool(r.flag & FLAG_READ2)): r
           for r in CramReader(path, reference=ref)}
    p1 = got[("p", False)]
    p2 = got[("p", True)]
    assert p1.tlen == (400 + 60) - 100
    assert p2.tlen == -p1.tlen
    assert p1.mate_pos == 400 and p2.mate_pos == 100
    assert p1.mate_ref_id == 0
    d = got[("d", False)]
    assert d.tlen == 360 and d.mate_pos == 1200 and d.mate_ref_id == 0
    # end-to-end: TLEN-based insert estimation works on this CRAM
    from hla_la_tpu.io.bam import estimate_insert_size_from_bam
    mean, sd = estimate_insert_size_from_bam(path, cram_reference=ref)
    assert mean in (360.0, 460.0) or 300 <= mean <= 500


def test_cram_fuzz_no_crash(tmp_path, world, rng):
    """Random junk, bit-flipped and truncated CRAMs must raise ValueError
    (or decode) — never crash, hang, or silently misparse into giant
    allocations."""
    ref, contigs, recs = world
    path = str(tmp_path / "f.cram")
    write_cram(path, contigs, recs, ref)
    good = open(path, "rb").read()

    def try_parse(blob):
        p = str(tmp_path / "x.cram")
        open(p, "wb").write(blob)
        try:
            for _ in CramReader(p, reference=ref):
                pass
        except (ValueError, NotImplementedError):
            pass

    # pure junk with CRAM magic
    for _ in range(50):
        n = int(rng.integers(0, 600))
        try_parse(b"CRAM" + bytes(rng.integers(0, 256, n, dtype=np.uint8)))
    # truncations
    for cut in range(26, len(good), max(1, len(good) // 60)):
        try_parse(good[:cut])
    # bit flips
    for _ in range(150):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try_parse(bytes(b))


def test_cram_unmapped_with_single_contig(tmp_path, rng):
    """Unmapped records chunked with mapped records on exactly ONE contig
    must keep ref_id=-1 (forces a multiref slice with per-record RI) and
    supplementary records must not be mate-attached."""
    ref = {"c1": "".join(rng.choice(list("ACGT"), 2000))}
    recs = [
        BamRecord(name="m1", flag=0, ref_id=0, pos=100, mapq=60,
                  cigar=[(50, 0)], seq=ref["c1"][100:150], qual="I" * 50),
        BamRecord(name="u1", flag=FLAG_UNMAPPED, ref_id=-1, pos=-1, mapq=0,
                  cigar=[], seq="ACGTACGTAC", qual="IIIIIIIIII"),
        # primary + supplementary with the same name: NOT a mate pair
        BamRecord(name="s1", flag=0, ref_id=0, pos=300, mapq=60,
                  cigar=[(40, 0)], seq=ref["c1"][300:340], qual="I" * 40),
        BamRecord(name="s1", flag=0x800, ref_id=0, pos=700, mapq=60,
                  cigar=[(40, 0)], seq=ref["c1"][700:740], qual="I" * 40),
    ]
    path = str(tmp_path / "u.cram")
    write_cram(path, [("c1", 2000)], recs, ref)
    got = list(CramReader(path, reference=ref))
    assert got[1].ref_id == -1 and (got[1].flag & FLAG_UNMAPPED)
    for orig, dec in zip(recs, got):
        assert dec.seq == orig.seq
        assert not (dec.flag & FLAG_PAIRED)      # no phantom pairing
    assert got[3].flag & 0x800


def test_cram_softmasked_reference(tmp_path, rng):
    """Reads written against a soft-masked (lowercase) reference decode to
    the correct uppercase bases (spec: references are normalised)."""
    up = "".join(rng.choice(list("ACGT"), 500))
    ref_lower = {"c1": up.lower()}
    seq = up[50:110]
    s = list(seq)
    s[10] = "ACGT"[("ACGT".index(s[10]) + 1) % 4]   # one real mismatch
    seq = "".join(s)
    recs = [BamRecord(name="r", flag=0, ref_id=0, pos=50, mapq=60,
                      cigar=[(60, 0)], seq=seq, qual="I" * 60)]
    path = str(tmp_path / "sm.cram")
    write_cram(path, [("c1", 500)], recs, ref_lower)
    got = list(CramReader(path, reference=ref_lower))
    assert got[0].seq == seq


def test_cram_block_and_container_crc_verified():
    """CRAM 3.x block and container-header CRC32s are verified on read: a
    flip in a RAW block's data (still 'decodable') or in a container
    header field must raise, never silently misparse."""
    import struct
    import zlib

    import pytest

    from hla_la_tpu.io.cram import (CT_EXTERNAL, M_RAW, read_block,
                                    read_container_header, write_block,
                                    write_container_header)

    blk = write_block(M_RAW, CT_EXTERNAL, 3, b"HELLO-CRAM-DATA")
    got, pos = read_block(blk, 0)
    assert got.data == b"HELLO-CRAM-DATA" and pos == len(blk)
    bad = bytearray(blk)
    bad[-10] ^= 0x01              # inside the raw data
    with pytest.raises(ValueError, match="CRC32"):
        read_block(bytes(bad), 0)

    hdr = write_container_header(0, 100, 50, 7, 0, 1000, 2, [0, 10], 999)
    parsed, pos = read_container_header(hdr, 0)
    assert parsed.n_records == 7 and pos == len(hdr)
    bad = bytearray(hdr)
    bad[6] ^= 0x02                # a header field byte
    with pytest.raises(ValueError, match="CRC32"):
        read_container_header(bytes(bad), 0)


def test_cram_eof_container_canonical_and_required(tmp_path, world):
    """write_cram ends with the spec's canonical 38-byte EOF container
    (CRAM 3.0 §11) — its two published CRC32s (container 05bdd94f, block
    ee63014b) reproduce from our encoders, cross-validating the CRC span
    conventions against htslib-written files.  Reading a CRAM truncated
    at a container boundary (EOF container gone) must raise."""
    import pytest

    ref, contigs, recs = world
    path = str(tmp_path / "e.cram")
    write_cram(path, contigs, recs, ref)
    data = open(path, "rb").read()
    eof = bytes.fromhex(
        "0f000000ffffffff0fe045" "4f4600000000010005bdd94f"
        "0001000606" "010001000100" "ee63014b")
    assert len(eof) == 38 and data.endswith(eof)
    n_recs = sum(1 for _ in CramReader(path, reference=ref))
    assert n_recs == len(recs)
    cut = str(tmp_path / "cut.cram")
    open(cut, "wb").write(data[:-len(eof)])
    with pytest.raises(ValueError, match="EOF container"):
        for _ in CramReader(cut, reference=ref):
            pass
