"""BAM/BGZF codec tests: write -> read round trip, extraction, FASTQ
conversion (the reference's BamTools/samtools layer, here native)."""

import numpy as np

from hla_la_tpu.io.bam import (BamReader, BamRecord, BamWriter, FLAG_PAIRED,
                               FLAG_READ1, FLAG_READ2, FLAG_REVERSE,
                               FLAG_UNMAPPED, bam_to_fastq_pairs,
                               extract_reads, record_to_fastq)


def _mk_record(name, seq, pos=100, flag=0, ref_id=0):
    return BamRecord(name=name, flag=flag, ref_id=ref_id, pos=pos, mapq=60,
                     cigar=[(len(seq), 0)], seq=seq,
                     qual="I" * len(seq))


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    refs = [("chr6", 1000), ("chrX", 500)]
    w = BamWriter(path, refs)
    recs = [
        _mk_record("r1", "ACGTACGT", pos=10),
        _mk_record("r2", "GGGGTTTT", pos=200, flag=FLAG_REVERSE, ref_id=1),
        _mk_record("r3", "NNACGT", pos=0, flag=FLAG_UNMAPPED),
    ]
    for r in recs:
        w.write(r)
    w.close()

    rd = BamReader(path)
    assert rd.references == refs
    got = list(rd)
    assert len(got) == 3
    for a, b in zip(recs, got):
        assert a.name == b.name
        assert a.seq == b.seq
        assert a.qual == b.qual
        assert a.flag == b.flag
        assert a.pos == b.pos
        assert a.cigar == b.cigar


def test_bam_many_records_multi_block(tmp_path):
    path = str(tmp_path / "big.bam")
    w = BamWriter(path, [("c", 10**6)])
    rng = np.random.default_rng(1)
    n = 3000
    for i in range(n):
        seq = "".join("ACGT"[j] for j in rng.integers(0, 4, 120))
        w.write(_mk_record(f"read{i}", seq, pos=int(rng.integers(0, 10**5))))
    w.close()
    rd = BamReader(path)
    got = list(rd)
    assert len(got) == n
    assert got[17].name == "read17"


def test_extract_and_pair(tmp_path):
    path = str(tmp_path / "p.bam")
    w = BamWriter(path, [("chr6", 10000), ("chr7", 10000)])
    pf = FLAG_PAIRED
    w.write(_mk_record("p1", "ACGTACGT", pos=100, flag=pf | FLAG_READ1))
    w.write(_mk_record("p1", "TTTTACGT", pos=300,
                       flag=pf | FLAG_READ2 | FLAG_REVERSE))
    w.write(_mk_record("far", "ACGTACGT", pos=9000))
    w.write(_mk_record("u1", "CCCCC", flag=FLAG_UNMAPPED))
    w.close()

    by_name, contigs = extract_reads(path, [("chr6", 0, 1000)])
    assert contigs == {"chr6": 10000, "chr7": 10000}
    assert set(by_name) == {"p1", "u1"}
    pairs, unpaired = bam_to_fastq_pairs(by_name)
    assert len(pairs) == 1 and len(unpaired) == 1
    r1, r2 = pairs[0]
    assert r1.seq == "ACGTACGT"
    # reverse-flagged mate comes back reverse-complemented
    assert r2.seq == "ACGTAAAA"


def test_record_to_fastq_orientation():
    r = _mk_record("x", "AACCGGTT", flag=FLAG_REVERSE)
    r.qual = "ABCDEFGH"
    fq = record_to_fastq(r)
    assert fq.seq == "AACCGGTT"[::-1].translate(str.maketrans("ACGT", "TGCA"))
    assert fq.qual == "HGFEDCBA"


def test_corrupted_bam_streams_do_not_crash(tmp_path, rng):
    """Native BAM parse must reject corrupted records instead of reading
    past buffers (fuzz-derived regression)."""
    import numpy as np

    import hla_la_tpu.native as native
    from hla_la_tpu.io.bam import BamRecord, BamWriter

    if not native.available():
        import pytest
        pytest.skip("native library not built")
    path = str(tmp_path / "f.bam")
    w = BamWriter(path, [("c", 1000)])
    for i in range(30):
        w.write(BamRecord(name=f"r{i}", flag=0, ref_id=0, pos=i, mapq=60,
                          cigar=[(30, 0)], seq="ACGT" * 8, qual="I" * 32))
    w.close()
    raw = open(path, "rb").read()
    good = native.bgzf_inflate_all(raw)
    for i in range(500):
        junk = rng.integers(0, 256, int(rng.integers(0, 1500))
                            ).astype(np.uint8).tobytes()
        native.bam_parse_packed(junk)
        native.bam_parse_packed(good[int(rng.integers(0, len(good))):])
        b = bytearray(good)
        for _ in range(12):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        native.bam_parse_packed(bytes(b))


def test_corrupt_bgzf_bsize_rejected(tmp_path):
    """BGZF block with BSIZE < 12+xlen+8 (negative cdata_len) must be
    rejected, not cast to a huge uInt avail_in (ADVICE r1, medium)."""
    import io
    import struct

    import pytest

    import hla_la_tpu.native as native
    from hla_la_tpu.io.bam import _iter_bgzf_blocks

    # craft a BGZF header whose BC BSIZE field is too small: xlen=6,
    # BSIZE-1 = 10  ->  cdata_len = 11 - 6 - 19 = -14
    header = struct.pack("<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
    extra = struct.pack("<BBHH", 66, 67, 2, 10)
    blob = header + extra + b"\x00" * 64
    with pytest.raises(ValueError):
        list(_iter_bgzf_blocks(io.BytesIO(blob)))
    if native.available():
        assert native.bgzf_inflate_all(blob) is None


def test_tail_corrupt_bam_raises_not_truncates(tmp_path):
    """When native BGZF inflate rejects a corrupt tail block, extraction
    must raise — not silently parse only the lazily-loaded first block
    (r2 regression: 327/348 reads silently returned)."""
    import struct

    import pytest

    from hla_la_tpu.io.bam import BamRecord, BamWriter, extract_reads

    path = str(tmp_path / "t.bam")
    w = BamWriter(path, [("c", 100000)])
    for i in range(2000):  # enough to span >1 BGZF block
        w.write(BamRecord(name=f"r{i}", flag=0, ref_id=0, pos=i, mapq=60,
                          cigar=[(40, 0)], seq="ACGT" * 10, qual="I" * 40))
    w.close()
    by_name, _ = extract_reads(path, None)
    assert sum(len(v) for v in by_name.values()) == 2000
    data = bytearray(open(path, "rb").read())
    # corrupt the BSIZE of the final (terminator) block
    off, last = 0, None
    while off + 18 <= len(data):
        bsize = struct.unpack_from("<H", data, off + 16)[0] + 1
        last = off
        off += bsize
    struct.pack_into("<H", data, last + 16, 10)
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        extract_reads(path, None)


def test_extract_reads_packed_matches_python(tmp_path, rng):
    """The vectorised packed extraction must match the record-by-record
    path for every region/unmapped combination."""
    from hla_la_tpu.io.bam import (BamRecord, BamWriter, extract_reads,
                                   FLAG_PAIRED, FLAG_READ1, FLAG_READ2,
                                   FLAG_REVERSE, FLAG_SECONDARY,
                                   FLAG_UNMAPPED)

    path = str(tmp_path / "e.bam")
    w = BamWriter(path, [("c1", 5000), ("c2", 8000)])
    for i in range(200):
        rid = int(rng.integers(0, 2))
        flag = FLAG_PAIRED | (FLAG_READ1 if i % 2 else FLAG_READ2)
        if i % 13 == 0:
            flag |= FLAG_UNMAPPED
        if i % 17 == 0:
            flag |= FLAG_SECONDARY
        if i % 3 == 0:
            flag |= FLAG_REVERSE
        n = int(rng.integers(20, 90))
        seq = "".join(rng.choice(list("ACGT"), n))
        cig = [(n // 2, 0), (3, 1), (n - n // 2, 0)] if i % 5 else [(n, 0)]
        w.write(BamRecord(name=f"r{i // 2}", flag=flag, ref_id=rid,
                          pos=int(rng.integers(0, 7000)),
                          mapq=int(rng.integers(0, 60)), cigar=cig, seq=seq,
                          qual="I" * n))
    w.close()
    for regions in (None, [("c1", 100, 3000)],
                    [("c1", 0, 0), ("c2", 500, 600)]):
        for inc in (True, False):
            a, ca = extract_reads(path, regions, include_unmapped=inc)
            b, cb = extract_reads(path, regions, include_unmapped=inc,
                                  with_tags=True)
            assert ca == cb and set(a) == set(b)
            for name in a:
                for x, y in zip(a[name], b[name]):
                    assert (x.flag, x.ref_id, x.pos, x.cigar, x.seq,
                            x.qual) == (y.flag, y.ref_id, y.pos, y.cigar,
                                        y.seq, y.qual)


def test_bgzf_payload_bitflip_detected_by_crc(tmp_path):
    """A bit flip inside a still-inflatable BGZF payload must raise via
    CRC32/ISIZE verification, not silently decode to wrong bytes (htslib
    semantics).  Stored (level-0) deflate keeps the stream inflatable, so
    only the CRC check can catch the flip."""
    import io
    import struct
    import zlib

    import pytest

    import hla_la_tpu.native as native
    from hla_la_tpu.io.bam import _iter_bgzf_blocks

    payload = b"The quick brown fox jumps over the lazy dog" * 10
    c = zlib.compressobj(0, zlib.DEFLATED, -15)  # stored deflate blocks
    cdata = c.compress(payload) + c.flush()
    total = 12 + 6 + len(cdata) + 8
    header = struct.pack("<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
    extra = struct.pack("<BBHH", 66, 67, 2, total - 1)
    tail = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                       len(payload))
    good = header + extra + cdata + tail
    assert list(_iter_bgzf_blocks(io.BytesIO(good))) == [payload]
    if native.available():
        assert native.bgzf_inflate_all(good) == payload

    bad = bytearray(good)
    bad[18 + 5 + 20] ^= 0x40      # flip a bit mid-payload (past the
    bad = bytes(bad)              # 5-byte stored-block header)
    with pytest.raises(ValueError, match="CRC|corrupt"):
        list(_iter_bgzf_blocks(io.BytesIO(bad)))
    if native.available():
        assert native.bgzf_inflate_all(bad) is None


def test_bam_truncated_at_block_boundary_rejected(tmp_path):
    """Truncation at an exact BGZF block boundary (EOF marker gone) must
    raise, not silently return fewer reads."""
    import struct

    import pytest

    from hla_la_tpu.io.bam import (BGZF_EOF, BamReader, BamRecord,
                                   BamWriter, extract_reads)

    path = str(tmp_path / "t.bam")
    w = BamWriter(path, [("c", 100000)])
    for i in range(3000):   # spans several BGZF blocks
        w.write(BamRecord(name=f"r{i}", flag=0, ref_id=0, pos=i, mapq=60,
                          cigar=[(40, 0)], seq="ACGT" * 10, qual="I" * 40))
    w.close()
    data = open(path, "rb").read()
    assert data.endswith(BGZF_EOF)
    # cut the EOF terminator (a block-boundary truncation)
    cut = str(tmp_path / "cut.bam")
    open(cut, "wb").write(data[:-len(BGZF_EOF)])
    with pytest.raises(ValueError, match="EOF marker"):
        BamReader(cut)
    with pytest.raises(ValueError, match="EOF marker"):
        extract_reads(cut, None)
    # cut a whole data block + the terminator: also rejected
    off, bounds = 0, []
    while off + 18 <= len(data):
        bsize = struct.unpack_from("<H", data, off + 16)[0] + 1
        bounds.append(off)
        off += bsize
    open(cut, "wb").write(data[:bounds[-2]])
    with pytest.raises(ValueError, match="EOF marker"):
        BamReader(cut)
