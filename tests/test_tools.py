"""Toolbox tests (Perl/ script equivalents)."""

import os

import numpy as np
import pytest

from hla_la_tpu.io.bam import (BamReader, BamRecord, BamWriter, FLAG_PAIRED,
                               FLAG_READ1, FLAG_SECONDARY)
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.tools import (amend_secondary_alignment_sequences,
                              analyse_gene_coverage, compare_utilized_reads,
                              downsample_bam, extract_kmer_counts,
                              reduce_bam_to_prg, truth_to_vcf)


def _mk(name, seq, pos=0, flag=0, ref_id=0, qual=None):
    return BamRecord(name=name, flag=flag, ref_id=ref_id, pos=pos, mapq=60,
                     cigar=[(len(seq), 0)] if seq else [], seq=seq,
                     qual=qual if qual is not None else "I" * len(seq))


def test_downsample(tmp_path):
    src = str(tmp_path / "in.bam")
    w = BamWriter(src, [("c", 1000)])
    for i in range(500):
        w.write(_mk(f"r{i}", "ACGT"))
    w.close()
    out = str(tmp_path / "out.bam")
    kept, total = downsample_bam(src, out, 0.5, seed=1)
    assert total == 500
    assert 150 < kept < 350
    assert len(list(BamReader(out))) == kept


def test_reduce_bam_to_prg(tmp_path, rng):
    sim = simulate_prg_package(rng, backbone_length=600)
    pkg = sim.write_package(str(tmp_path / "pkg"), compile_now=False)
    with open(os.path.join(pkg.dir, "knownReferences", "k.txt"), "w") as fh:
        fh.write("contigID\tcontigLength\tExtractCompleteContig\t"
                 "PartialExtraction_Start\tPartialExtraction_Stop\n")
        fh.write("chr6\t5000\t\t1000\t2000\n")
        fh.write("chr7\t5000\t0\t\t\n")
    src = str(tmp_path / "in.bam")
    w = BamWriter(src, [("chr6", 5000), ("chr7", 5000)])
    w.write(_mk("in_region", "ACGTACGT", pos=1500))
    w.write(_mk("out_region", "ACGTACGT", pos=3000))
    w.write(_mk("other_contig", "ACGTACGT", pos=1500, ref_id=1))
    w.close()
    out = str(tmp_path / "red.bam")
    n = reduce_bam_to_prg(src, pkg, out)
    names = {r.name for r in BamReader(out)}
    assert names == {"in_region"}
    assert n == 1


def test_amend_secondary(tmp_path):
    src = str(tmp_path / "s.bam")
    w = BamWriter(src, [("c", 1000)])
    w.write(_mk("r1", "ACGTACGT", flag=FLAG_PAIRED | FLAG_READ1))
    w.write(_mk("r1", "", flag=FLAG_PAIRED | FLAG_READ1 | FLAG_SECONDARY,
                qual=""))
    w.close()
    out = str(tmp_path / "a.bam")
    n = amend_secondary_alignment_sequences(src, out)
    assert n == 1
    recs = list(BamReader(out))
    assert recs[1].seq == "ACGTACGT"


def test_truth_to_vcf(tmp_path):
    ref = "ACGT_ACGTAC"
    h1 = "ACTT_ACGTAC"   # SNP at ref pos 3
    h2 = "ACGTTACGTAC"   # insertion after ref pos 4
    out = str(tmp_path / "t.vcf")
    n = truth_to_vcf(ref, h1, h2, "chr6", out)
    lines = [l for l in open(out) if not l.startswith("#")]
    assert n == len(lines) == 2
    f0 = lines[0].split("\t")
    assert f0[1] == "3" and f0[3] == "G" and "T" in f0[4]


def test_coverage_and_read_compare(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    (d1 / "R1_pileup_A.txt").write_text("0\t0\t5\n0\t1\t7\n0\t2\t0\n")
    (d1 / "R1_readIDs_A.txt").write_text("r1\nr2\n")
    (d2 / "R1_readIDs_A.txt").write_text("r2\nr3\n")
    cov = analyse_gene_coverage(str(d1))
    assert cov["A"]["n_columns"] == 3
    assert cov["A"]["zero_columns"] == 1
    rep = compare_utilized_reads(str(d1), str(d2))
    assert rep["A"] == dict(only_a=1, only_b=1, shared=1)


def test_extract_kmer_counts():
    exon = {"A_exon2": "ACGTACGTACGTACGTACGTACGTACGTACGTACG"}
    reads = [exon["A_exon2"][:33], exon["A_exon2"][2:]]
    counts = extract_kmer_counts(reads, exon, k=31)
    assert any(v > 0 for v in counts["A_exon2"].values())


def test_graph_from_mfa_and_check(tmp_path):
    from hla_la_tpu.cli import main
    from hla_la_tpu.tools import graph_from_mfa

    mfa = tmp_path / "panel.mfa"
    mfa.write_text(">h1\nACGTAACGTACGTACGTACGTACGT\n"
                   ">h2\nACGTTACGTACG-ACGTACGTACGT\n"
                   ">h3\nACGTAACGTACGGACG-ACGTACGT\n")
    out = str(tmp_path / "g")
    pkg = graph_from_mfa(str(mfa), out)
    prg = pkg.prg()
    prg.check_structure()
    # every row must be an emittable path of the graph
    fasta = pkg.prg_fasta()
    for name in ("h1", "h2", "h3"):
        assert name in fasta
    assert main(["--action", "checkKIRgraph", "--graph", out]) == 0


def test_find_gene_reads_in_bam(tmp_path):
    import numpy as np
    from hla_la_tpu.io.bam import BamRecord, BamWriter
    from hla_la_tpu.tools import find_gene_reads_in_bam

    rng = np.random.default_rng(11)
    gene_a = "".join(rng.choice(list("ACGT"), 200))
    gene_b = "".join(rng.choice(list("ACGT"), 200))
    panel = tmp_path / "panel.fa"
    panel.write_text(f">geneA\n{gene_a}\n>geneB\n{gene_b}\n")
    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, [("chr1", 10000)])
    for i in range(5):
        w.write(BamRecord(name=f"a{i}", flag=0, ref_id=0, pos=i * 10,
                          mapq=60, cigar=[(80, 0)], seq=gene_a[i:i + 80],
                          qual="I" * 80))
    noise = "".join(rng.choice(list("ACGT"), 80))
    w.write(BamRecord(name="junk", flag=0, ref_id=0, pos=0, mapq=60,
                      cigar=[(80, 0)], seq=noise, qual="I" * 80))
    w.close()
    hits = find_gene_reads_in_bam(bam, str(panel), k=31)
    assert hits["geneA"] == 5
    assert hits["geneB"] == 0


def test_rename_bam_contigs(tmp_path):
    from hla_la_tpu.io.bam import BamReader, BamRecord, BamWriter
    from hla_la_tpu.tools import rename_bam_contigs

    src = str(tmp_path / "a.bam")
    w = BamWriter(src, [("6", 1000), ("7", 1000)])
    w.write(BamRecord(name="r1", flag=0, ref_id=0, pos=10, mapq=60,
                      cigar=[(4, 0)], seq="ACGT", qual="IIII"))
    w.write(BamRecord(name="r2", flag=0, ref_id=1, pos=20, mapq=60,
                      cigar=[(4, 0)], seq="GGTT", qual="IIII"))
    w.close()
    dst = str(tmp_path / "b.bam")
    n = rename_bam_contigs(src, dst, {"6": "chr6"})
    assert n == 2
    rd = BamReader(dst)
    assert rd.references == [("chr6", 1000), ("7", 1000)]
    assert [r.name for r in rd] == ["r1", "r2"]


def test_sample_reference_genomes(tmp_path, rng):
    import os

    from hla_la_tpu.io.fasta import read_fasta
    from hla_la_tpu.sim.graph_sim import simulate_prg_package
    from hla_la_tpu.tools import sample_reference_genomes

    sim = simulate_prg_package(rng, backbone_length=800, n_haplotypes=5)
    pkg = sim.write_package(str(tmp_path / "pkg"))
    paths = sample_reference_genomes(pkg, n_samples=4)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    # sample 1 keeps every sequence (sampleReferenceGenome.pl:69-72)
    assert len(read_fasta(paths[0])) == len(pkg.sequences())
    lst = os.path.join(pkg.dir, "sampledReferenceGenomes.txt")
    assert open(lst).read().strip().splitlines() == paths


def test_graph_from_mfa_gap_and_case_normalisation(tmp_path):
    from hla_la_tpu.tools import graph_from_mfa

    mfa = tmp_path / "p.mfa"
    mfa.write_text(">h1\nacgtAACGTACGTACGTACGTACGT\n"
                   ">h2\nACGT.ACGTACG-ACGTACGTacgt\n")
    pkg = graph_from_mfa(str(mfa), str(tmp_path / "g"))
    fasta = pkg.prg_fasta()
    assert fasta["h1"].isupper() and "-" not in fasta["h2"]
    assert len(fasta["h2"]) == 23     # two gap columns removed


def test_compare_tool_calls(tmp_path):
    """Competitor-comparison harness (forPaper/runxHLA role): side-by-side
    multi-resolution concordance of our calls vs an external tool's."""
    from hla_la_tpu.tools import compare_tool_calls

    truth = tmp_path / "truth.txt"
    truth.write_text("IndividualID\tA\tA\tB\tB\n"
                     "S1\tA*02:01\tA*03:01\tB*07:02\tB*08:01\n")
    ours = tmp_path / "ours.txt"
    ours.write_text("IndividualID\tA\tA\tB\tB\n"
                    "S1\tA*02:01:01\tA*03:01\tB*07:02\tB*08:01\n")
    other = tmp_path / "xhla.txt"
    other.write_text("IndividualID\tA\tA\tB\tB\n"
                     "S1\tA*02:01\tA*11:01\tB*07:02\tB*44:02\n")
    out = tmp_path / "cmp.txt"
    stats = compare_tool_calls(str(ours), str(other), str(truth), str(out),
                               other_name="xHLA")
    assert stats["ours"]["4digit"] == 1.0
    assert stats["xHLA"]["4digit"] == 0.5
    text = out.read_text()
    assert "TOTAL_ours" in text and "TOTAL_xHLA" in text
    # bestguess-format input also accepted
    bg = tmp_path / "bestguess.txt"
    bg.write_text("Locus\tChromosome\tAllele\tQ1\n"
                  "A\t1\tA*02:01\t1\nA\t2\tA*03:01\t1\n"
                  "B\t1\tB*07:02\t1\nB\t2\tB*08:01\t1\n")
    stats2 = compare_tool_calls(str(bg), str(other), str(truth),
                                str(tmp_path / "cmp2.txt"))
    assert stats2["ours"]["4digit"] == 1.0


def test_truth_to_vcf_indel_anchoring(tmp_path):
    """Anchored indels sit on the reference base BEFORE the event:
    applying the records must reproduce the haplotype (the old pos+1
    placement shifted every indel one base right)."""
    ref = "ACGT_ACGTAC"
    h2 = "ACGTTACGTAC"   # T inserted between ref pos 4 and 5
    out = str(tmp_path / "t.vcf")
    truth_to_vcf(ref, h2, h2, "chr6", out)
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(recs) == 1
    pos, vref, valt = int(recs[0][1]), recs[0][3], recs[0][4]
    assert pos == 4 and vref == "N" and valt == "NT"
    # apply: replace the anchor (= ref base at `pos`) + consumed ref bases
    plain = ref.replace("_", "")
    applied = (plain[:pos - 1] + valt.replace("N", plain[pos - 1])
               + plain[pos - 1 + len(vref):])
    assert applied == h2.replace("_", "")

    # deletion: ref ACG -> A_G deletes C; anchor on the A at pos 1
    out2 = str(tmp_path / "d.vcf")
    truth_to_vcf("ACG", "A_G", "A_G", "chr6", out2)
    recs = [l.split("\t") for l in open(out2) if not l.startswith("#")]
    pos, vref, valt = int(recs[0][1]), recs[0][3], recs[0][4]
    plain = "ACG"
    applied = (plain[:pos - 1] + valt.replace("N", plain[pos - 1])
               + plain[pos - 1 + len(vref):])
    assert applied == "AG", (pos, vref, valt)


def test_downsample_reproducible_across_processes(tmp_path):
    """The kept set must be a pure function of (names, seed) — builtin
    hash() is salted per process (PYTHONHASHSEED) and broke this."""
    import subprocess
    import sys

    src = str(tmp_path / "a.bam")
    w = BamWriter(src, [("c", 1000)])
    for i in range(50):
        w.write(_mk(f"r{i}", "ACGT", pos=i))
    w.close()
    names = []
    for run in range(2):
        out = str(tmp_path / f"o{run}.bam")
        code = (
            "import sys; sys.path.insert(0, '/root/repo')\n"
            "from hla_la_tpu.tools import downsample_bam\n"
            f"downsample_bam({src!r}, {out!r}, 0.5, seed=7)\n")
        subprocess.run([sys.executable, "-c", code], check=True,
                       env={**os.environ, "PYTHONHASHSEED": "random"})
        names.append([r.name for r in BamReader(out)])
    assert names[0] == names[1]
    assert 5 < len(names[0]) < 45


def test_rename_bam_contigs_keeps_header(tmp_path):
    """@RG/@PG survive a contig rename and @SQ SN: fields are renamed."""
    from hla_la_tpu.io.bam import BamReader, BamWriter
    from hla_la_tpu.tools import rename_bam_contigs

    src = str(tmp_path / "a.bam")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           "@SQ\tSN:6\tLN:1000\n"
           "@RG\tID:rg1\tSM:S1\n")
    w = BamWriter(src, [("6", 1000)], hdr)
    w.write(_mk("r1", "ACGT", pos=1))
    w.close()
    dst = str(tmp_path / "b.bam")
    rename_bam_contigs(src, dst, {"6": "chr6"})
    rd = BamReader(dst)
    assert "@RG\tID:rg1\tSM:S1" in rd.header_text
    assert "SO:coordinate" in rd.header_text
    assert "SN:chr6" in rd.header_text and "SN:6" not in rd.header_text
    assert rd.references == [("chr6", 1000)]


def test_import_xhla(tmp_path):
    """xHLA report.json + --full TSV convert to bestguess-format call files
    (forPaper/runxHLA.pl:125-207 conversion semantics: alleles array ->
    Locus/Chromosome/Allele rows, full column must extend type column)."""
    import json

    from hla_la_tpu.tools import compare_tool_calls, import_xhla

    report = tmp_path / "report-S1-hla.json"
    report.write_text(json.dumps({
        "sample_id": "S1",
        "hla": {"alleles": ["A*02:01", "A*03:01", "B*07:02"]},
    }))
    full = tmp_path / "S1.hla.full"
    full.write_text("type\tfull\tother\n"
                    "A*02:01\tA*02:01:01\tx\n"
                    "A*03:01\tA*03:01:02\tx\n"
                    "B*07:02\tB*07:02:01\tx\n")
    out = tmp_path / "xhla_calls.txt"
    out_hr = tmp_path / "xhla_calls_hr.txt"
    by_locus = import_xhla(str(report), str(out), str(full), str(out_hr))
    assert by_locus == {"A": ["A*02:01", "A*03:01"], "B": ["B*07:02"]}
    rows = out.read_text().splitlines()
    assert rows[0] == "Locus\tChromosome\tAllele\tQ1\tQ2"
    assert rows[1] == "A\t1\tA*02:01\t1\t1"
    assert rows[2] == "A\t2\tA*03:01\t1\t1"
    assert rows[3] == "B\t1\tB*07:02\t1\t1"
    hr_rows = out_hr.read_text().splitlines()
    assert hr_rows[1] == "A\t1\tA*02:01:01\t1\t1"
    assert hr_rows[3] == "B\t1\tB*07:02:01\t1\t1"

    # converted output feeds straight into the comparison harness
    truth = tmp_path / "truth.txt"
    truth.write_text("IndividualID\tA\tA\n"
                     "S1\tA*02:01\tA*03:01\n")
    stats = compare_tool_calls(str(out), str(out), str(truth),
                               str(tmp_path / "cmp.txt"), other_name="xHLA")
    assert stats["xHLA"]["4digit"] == 1.0

    # full row that does not extend its type is rejected
    bad = tmp_path / "bad.full"
    bad.write_text("type\tfull\n"
                   "A*02:01\tA*99:99\n"
                   "A*03:01\tA*03:01:02\n"
                   "B*07:02\tB*07:02:01\n")
    try:
        import_xhla(str(report), str(out), str(bad), str(out_hr))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "does not extend" in str(e)


def test_remap_and_reduce(tmp_path, rng):
    """remapAndReduce.pl workflow (Perl/remapAndReduce.pl) with our graph
    aligner as the remapper: WGS-style BAM in -> coordinate-sorted BAM on
    the PRG pseudo-contig; error-free reads must land at their exact truth
    level."""
    from hla_la_tpu.graph.package import GraphPackage
    from hla_la_tpu.io.bam import FLAG_READ2, FLAG_REVERSE, revcomp
    from hla_la_tpu.sim.read_sim import ReadSimulator
    from hla_la_tpu.tools import remap_and_reduce

    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=3)
    pkg_dir = str(tmp_path / "pkg")
    sim.write_package(pkg_dir)
    contig_len = 50000
    with open(os.path.join(pkg_dir, "knownReferences", "k.txt"), "w") as fh:
        fh.write("contigID\tcontigLength\tExtractCompleteContig\t"
                 "PartialExtraction_Start\tPartialExtraction_Stop\n")
        fh.write(f"chr6\t{contig_len}\t1\t\t\n")
    rs = ReadSimulator(rng, read_length=90, fragment_mean=280,
                       fragment_sd=20, with_error=False)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 5.0,
                                               name_prefix=f"h{h}")
    bam_path = str(tmp_path / "in.bam")
    w = BamWriter(bam_path, [("chr6", contig_len)])
    truth_first = {}
    for p in pairs:
        for mate_flag, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
            seq, qual, flag = r.seq, r.qual, FLAG_PAIRED | mate_flag
            if r.reverse:
                seq, qual = revcomp(seq), qual[::-1]
                flag |= FLAG_REVERSE
            w.write(BamRecord(name=r.name, flag=flag, ref_id=0,
                              pos=max(r.start_pos, 0), mapq=60,
                              cigar=[(len(seq), 0)], seq=seq, qual=qual))
            lv = r.levels[r.levels >= 0]
            truth_first[(r.name, mate_flag == FLAG_READ1)] = int(lv.min())
    w.close()

    out_path = str(tmp_path / "remapped.bam")
    pkg = GraphPackage(pkg_dir)
    n_pairs, n_un = remap_and_reduce(bam_path, pkg, out_path)
    assert n_pairs >= 0.9 * len(pairs)
    assert n_un == 0
    rd = BamReader(out_path)
    assert rd.references == [("PRG", pkg.prg().n_levels)]
    recs = list(rd)
    rd.close()
    assert len(recs) == 2 * n_pairs
    assert all(a.pos <= b.pos for a, b in zip(recs, recs[1:]))
    exact = 0
    for rec in recs:
        # read-consuming CIGAR ops must cover the stored sequence exactly
        n_read = sum(ln for ln, op in rec.cigar if op in (0, 1, 4))
        assert n_read == len(rec.seq), (rec.name, rec.cigar_string())
        assert 0 <= rec.pos < pkg.prg().n_levels
        exact += rec.pos == truth_first[(rec.name, rec.is_read1)]
    assert exact >= 0.9 * len(recs), f"{exact}/{len(recs)} at truth level"


def test_downsample_wgs_bams(tmp_path):
    """Batch gigabase-target downsampling (downsample_WGS_BAMs.pl): the
    sampling fraction is derived from each input's own base count."""
    from hla_la_tpu.tools import downsample_wgs_bams

    src = str(tmp_path / "wgs.bam")
    w = BamWriter(src, [("c", 1000)])
    for i in range(400):
        w.write(_mk(f"r{i}", "A" * 100))   # 40 kb total
    w.close()
    # target = half the input's bases -> fraction 0.5
    res = downsample_wgs_bams([src], str(tmp_path / "out"),
                              target_gigabases=20_000 / 1e9, seed=3)
    (in_path, out_path, frac, kept, total), = res
    assert in_path == src and os.path.exists(out_path)
    assert abs(frac - 0.5) < 1e-9
    assert total == 400 and 120 < kept < 280
    # a target above the input keeps everything
    res2 = downsample_wgs_bams([src], str(tmp_path / "out2"),
                               target_gigabases=1.0, seed=3)
    assert res2[0][2] == 1.0 and res2[0][3] == 400


def test_alignment_cigar_branches():
    """_alignment_cigar unit coverage: M/I/D columns, graph-gap columns
    and level jumps become D, edge insertions fold into soft clips."""
    from hla_la_tpu.models.alignment import GraphAlignment
    from hla_la_tpu.tools import _alignment_cigar

    def mk(levels, seq, graph):
        n = len(levels)
        return GraphAlignment(
            levels=np.asarray(levels, dtype=np.int64),
            graph_c=np.frombuffer(graph.encode(), dtype=np.uint8).copy(),
            seq_c=np.frombuffer(seq.encode(), dtype=np.uint8).copy(),
            seq_qual=np.full(n, 40, dtype=np.uint8), reverse=False)

    # M M I M D M  (insertion at level -1, deletion = seq gap)
    lead, trail, cig = _alignment_cigar(
        mk([10, 11, -1, 12, 13, 14], "ACGT_C", "AC_TGC"))
    assert (lead, trail) == (0, 0)
    assert cig == [(2, 0), (1, 1), (1, 0), (1, 2), (1, 0)], cig

    # graph-gap column (seq gap at a level) is D; level jump 12->15 adds 2D
    lead, trail, cig = _alignment_cigar(
        mk([10, 11, 12, 15], "AC_T", "AC_G"))
    assert cig == [(2, 0), (3, 2), (1, 0)], cig   # 1D + 2D jump merged

    # leading + trailing insertions fold into clips
    lead, trail, cig = _alignment_cigar(
        mk([-1, 10, 11, -1], "GACT", "_AC_"))
    assert (lead, trail) == (1, 1)
    assert cig == [(2, 0)], cig

    # nothing reference-consuming -> None
    assert _alignment_cigar(mk([-1, -1], "AC", "__")) is None


def test_remap_and_reduce_cram(tmp_path, rng):
    """remap_and_reduce accepts CRAM input with a decode reference
    (HLA-LA.pl:221-229 BAM-or-CRAM contract)."""
    from hla_la_tpu.graph.package import GraphPackage
    from hla_la_tpu.io.bam import FLAG_READ2, FLAG_REVERSE, revcomp
    from hla_la_tpu.io.cram_write import write_cram
    from hla_la_tpu.sim.read_sim import ReadSimulator
    from hla_la_tpu.tools import remap_and_reduce

    sim = simulate_prg_package(rng, backbone_length=1200, n_haplotypes=3)
    pkg_dir = str(tmp_path / "pkg")
    sim.write_package(pkg_dir)
    contig_len = 20000
    with open(os.path.join(pkg_dir, "knownReferences", "k.txt"), "w") as fh:
        fh.write("contigID\tcontigLength\tExtractCompleteContig\t"
                 "PartialExtraction_Start\tPartialExtraction_Stop\n")
        fh.write(f"chr6\t{contig_len}\t1\t\t\n")
    rs = ReadSimulator(rng, read_length=80, fragment_mean=250,
                       fragment_sd=15, with_error=False)
    seq, levels = sim.linearized(1)
    pairs = rs.simulate_pairs_from_string(seq, levels, 4.0,
                                          name_prefix="h1")
    records = []
    for p in pairs:
        for mf, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
            s, q, flag = r.seq, r.qual, FLAG_PAIRED | mf
            if r.reverse:
                s, q, flag = revcomp(s), q[::-1], flag | FLAG_REVERSE
            records.append(BamRecord(name=r.name, flag=flag, ref_id=0,
                                     pos=max(r.start_pos, 0), mapq=60,
                                     cigar=[(len(s), 0)], seq=s, qual=q))
    ref_seq = "".join(rng.choice(list("ACGT"), contig_len))
    cram = str(tmp_path / "in.cram")
    write_cram(cram, [("chr6", contig_len)], records, {"chr6": ref_seq})
    out = str(tmp_path / "remapped.bam")
    n_pairs, n_un = remap_and_reduce(cram, GraphPackage(pkg_dir), out,
                                     cram_reference={"chr6": ref_seq})
    assert n_pairs >= 0.9 * len(pairs), (n_pairs, len(pairs))
