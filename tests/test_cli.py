"""CLI orchestration tests incl. the BAM input path with knownReferences
auto-detection (HLA-LA.pl equivalent)."""

import os

import numpy as np
import pytest

from hla_la_tpu.cli import main
from hla_la_tpu.io.bam import (BamRecord, BamWriter, FLAG_PAIRED, FLAG_READ1,
                               FLAG_READ2, FLAG_REVERSE)
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp


def test_test_binary(capsys):
    assert main(["--action", "testBinary"]) == 0
    assert "functional" in capsys.readouterr().out


def test_prepare_graph(tmp_path, rng):
    sim = simulate_prg_package(rng, backbone_length=500)
    pkg = sim.write_package(str(tmp_path / "g"), compile_now=False)
    assert main(["--action", "prepareGraph", "--graph", str(tmp_path / "g")]) == 0
    assert os.path.exists(pkg.serialized_path)


def _bam_world(tmp_path, rng):
    """Simulated package + knownReferences spec + matching BAM (shared by
    the HLA-action tests)."""
    sim = simulate_prg_package(rng, backbone_length=1800, n_haplotypes=4)
    pkg_dir = str(tmp_path / "g")
    sim.write_package(pkg_dir)
    # add a knownReferences file matching the BAM header we will write
    contig_len = 100000
    with open(os.path.join(pkg_dir, "knownReferences", "fake.txt"), "w") as fh:
        fh.write("contigID\tcontigLength\tExtractCompleteContig\t"
                 "PartialExtraction_Start\tPartialExtraction_Stop\n")
        fh.write(f"chr6\t{contig_len}\t1\t\t\n")

    # simulate reads from haplotypes 1+2 and write them as a coordinate-less
    # BAM on contig chr6
    rs = ReadSimulator(rng, read_length=90, fragment_mean=300, fragment_sd=25)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 12.0,
                                               name_prefix=f"h{h}")
    bam_path = str(tmp_path / "in.bam")
    w = BamWriter(bam_path, [("chr6", contig_len)])
    for p in pairs:
        for mate_flag, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
            seq, qual = r.seq, r.qual
            flag = FLAG_PAIRED | mate_flag
            if r.reverse:
                # store in reference orientation with the reverse flag
                seq = revcomp(seq)
                qual = qual[::-1]
                flag |= FLAG_REVERSE
            w.write(BamRecord(name=r.name, flag=flag, ref_id=0,
                              pos=max(r.start_pos, 0), mapq=60,
                              cigar=[(len(seq), 0)], seq=seq, qual=qual))
    w.close()
    return pkg_dir, bam_path


def test_hla_action_from_bam(tmp_path, rng):
    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    out_dir = str(tmp_path / "out")
    rc = main(["--action", "HLA", "--BAM", bam_path, "--graph", pkg_dir,
               "--sampleID", "S1", "--workingDir", str(tmp_path),
               "--outputDirectory", out_dir])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "hla", "R1_bestguess.txt"))
    with open(os.path.join(out_dir, "hla", "R1_bestguess.txt")) as fh:
        lines = fh.read().splitlines()[1:]
    assert lines
    called = {l.split("\t")[2].split(";")[0].split("*")[1].split(":")[0]
              for l in lines if l.startswith("A\t")}
    assert called == {"02", "03"}


def test_hla_multi_host_shards_match_single_host(tmp_path, rng):
    """Multi-host HLA: two hosts each align their read slice
    (--nHosts/--hostIdx/--shardDir), then --mergeShards types from the
    shards — every typing output must be byte-identical to the single-host
    run (same insert estimate, shard orig-index order restoration)."""
    import filecmp

    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    single = str(tmp_path / "single")
    assert main(["--action", "HLA", "--BAM", bam_path, "--graph", pkg_dir,
                 "--sampleID", "S1", "--workingDir", str(tmp_path),
                 "--outputDirectory", single]) == 0

    shard_dir = str(tmp_path / "shards")
    for host in ("0", "1"):
        assert main(["--action", "HLA", "--BAM", bam_path,
                     "--graph", pkg_dir, "--sampleID", "S1",
                     "--workingDir", str(tmp_path),
                     "--outputDirectory", str(tmp_path / f"h{host}"),
                     "--nHosts", "2", "--hostIdx", host,
                     "--shardDir", shard_dir]) == 0
    assert os.path.exists(os.path.join(shard_dir, "align_shard_0of2.npz"))
    assert os.path.exists(os.path.join(shard_dir, "align_shard_1of2.npz"))

    merged = str(tmp_path / "merged")
    assert main(["--action", "HLA", "--graph", pkg_dir, "--sampleID", "S1",
                 "--workingDir", str(tmp_path), "--outputDirectory", merged,
                 "--mergeShards", shard_dir]) == 0

    for fn in ("hla/R1_bestguess.txt", "hla/R1_bestguess_G.txt",
               "reads_per_level.txt"):
        a, b = os.path.join(single, fn), os.path.join(merged, fn)
        assert filecmp.cmp(a, b, shallow=False), f"{fn} differs"
    # per-locus outputs too
    import glob
    for a in glob.glob(os.path.join(single, "hla", "R1_pileup_*.txt")):
        b = os.path.join(merged, "hla", os.path.basename(a))
        assert filecmp.cmp(a, b, shallow=False), os.path.basename(a)


def test_hla_sharded_backend_matches_host(tmp_path, rng):
    """--backend sharded (production NW batches device-sharded over the
    mesh data axis, SURVEY §2.3) must produce byte-identical typing
    outputs to the host backend — here on the suite's 8 virtual CPU
    devices; on a pod slice the same code runs over ICI."""
    import filecmp
    import glob
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 (virtual) device")
    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    outs = {}
    for label, extra in (("host", []), ("sharded", ["--backend", "sharded"])):
        out = str(tmp_path / label)
        assert main(["--action", "HLA", "--BAM", bam_path, "--graph",
                     pkg_dir, "--sampleID", "S1", "--workingDir",
                     str(tmp_path), "--outputDirectory", out] + extra) == 0
        outs[label] = out
    for fn in ("hla/R1_bestguess.txt", "hla/R1_bestguess_G.txt",
               "reads_per_level.txt"):
        a = os.path.join(outs["host"], fn)
        b = os.path.join(outs["sharded"], fn)
        assert filecmp.cmp(a, b, shallow=False), f"{fn} differs"
    for a in glob.glob(os.path.join(outs["host"], "hla", "R1_pileup_*.txt")):
        b = os.path.join(outs["sharded"], "hla", os.path.basename(a))
        assert filecmp.cmp(a, b, shallow=False), os.path.basename(a)


def test_kir_action_paired_fastq(tmp_path, rng):
    """--action KIR with --FASTQ1/2 exercises the paired insert-size model."""
    from hla_la_tpu.io.fastq import write_fastq, FastqRead

    base = "".join(rng.choice(list("ACGT"), 800))
    alt = base[:400] + "".join(rng.choice(list("ACGT"), 3)) + base[403:]
    panel = tmp_path / "panel.fa"
    panel.write_text(f">h1\n{base}\n>h2\n{alt}\n")
    r1s, r2s = [], []
    frag, rl = 280, 80
    for i, s in enumerate(range(0, 800 - frag - 1, 23)):
        r1 = base[s:s + rl]
        r2 = base[s + frag - rl:s + frag]
        rc = r2.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        r1s.append(FastqRead(f"p{i}/1", r1, "I" * rl))
        r2s.append(FastqRead(f"p{i}/2", rc, "I" * rl))
    write_fastq(str(tmp_path / "R1.fq"), r1s)
    write_fastq(str(tmp_path / "R2.fq"), r2s)
    rc_code = main(["--action", "KIR", "--ALTpanel", str(panel),
                    "--FASTQ1", str(tmp_path / "R1.fq"),
                    "--FASTQ2", str(tmp_path / "R2.fq")])
    assert rc_code == 0


def test_hla_action_zero_matching_reads(tmp_path, rng):
    """A BAM whose reads share nothing with the graph (exome miss, wrong
    region) must complete gracefully: rc 0, bestguess written with flat
    low-confidence calls and zero coverage — the user detects the failure
    from Q1/AverageCoverage, not a crash (mirrors the reference's
    flat-prior behaviour when a locus has no observations)."""
    pkg_dir, _ = _bam_world(tmp_path, rng)
    bam_path = str(tmp_path / "none.bam")
    w = BamWriter(bam_path, [("chr6", 100000)])
    for i in range(30):
        seq = "".join(rng.choice(list("ACGT"), 101))
        for flag, pos in ((FLAG_READ1, 1000 + i), (FLAG_READ2, 1300 + i)):
            w.write(BamRecord(name=f"x{i}", flag=FLAG_PAIRED | flag,
                              ref_id=0, pos=pos, mapq=60,
                              cigar=[(101, 0)], seq=seq, qual="I" * 101))
    w.close()
    out_dir = str(tmp_path / "out0")
    rc = main(["--action", "HLA", "--BAM", bam_path, "--graph", pkg_dir,
               "--sampleID", "S1", "--workingDir", str(tmp_path),
               "--outputDirectory", out_dir])
    assert rc == 0
    with open(os.path.join(out_dir, "hla", "R1_bestguess.txt")) as fh:
        rows = [l.split("\t") for l in fh.read().splitlines()[1:]]
    assert rows
    for r in rows:
        assert float(r[3]) < 0.5          # Q1: no confident call
        assert float(r[5]) == 0.0         # AverageCoverage


def test_hla_action_extract_exon_kmer_counts(tmp_path, rng):
    """--extractExonkMerCounts 1 writes kMerCounts.txt as part of the HLA
    action (HLA-LA.pl:543-552 runs extractkMerCounts.pl on the extracted
    FASTQs)."""
    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    out_dir = str(tmp_path / "outk")
    rc = main(["--action", "HLA", "--BAM", bam_path, "--graph", pkg_dir,
               "--sampleID", "S1", "--workingDir", str(tmp_path),
               "--outputDirectory", out_dir,
               "--extractExonkMerCounts", "1"])
    assert rc == 0
    path = os.path.join(out_dir, "kMerCounts.txt")
    with open(path) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == "Exon\tkMer\tCount"
    assert len(lines) > 10
    # exon k-mers absent from the reads report 0; covered ones must show up
    assert any(int(l.split("\t")[2]) > 0 for l in lines[1:])


def test_hla_action_keep_extracted_fastq(tmp_path, rng):
    """--keepExtractedFastq 1 materialises the extraction FASTQs (the
    reference leaves R_1/R_2 in the working dir, HLA-LA.pl:465-502), and
    re-typing from them reproduces the BAM run's calls."""
    import filecmp
    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    out1 = str(tmp_path / "o1")
    rc = main(["--action", "HLA", "--BAM", bam_path, "--graph", pkg_dir,
               "--sampleID", "S1", "--workingDir", str(tmp_path),
               "--outputDirectory", out1, "--keepExtractedFastq", "1"])
    assert rc == 0
    r1 = os.path.join(out1, "R_1.fastq")
    r2 = os.path.join(out1, "R_2.fastq")
    assert os.path.exists(r1) and os.path.exists(r2)
    out2 = str(tmp_path / "o2")
    rc = main(["--action", "HLA", "--FASTQ1", r1, "--FASTQ2", r2,
               "--graph", pkg_dir, "--sampleID", "S1",
               "--workingDir", str(tmp_path), "--outputDirectory", out2])
    assert rc == 0
    assert filecmp.cmp(os.path.join(out1, "hla", "R1_bestguess.txt"),
                       os.path.join(out2, "hla", "R1_bestguess.txt"),
                       shallow=False)


def test_hla_action_warns_on_short_unpaired_reads(tmp_path, rng, capsys):
    """Short reads through --FASTQU without --longReads are a non-workflow
    (the reference's 1000bp unpaired minimum, HLATyper.cpp:1032, filters
    them all): the CLI must warn loudly instead of silently producing
    zero-coverage calls."""
    from hla_la_tpu.io.fastq import write_fastq, FastqRead
    pkg_dir, _ = _bam_world(tmp_path, rng)
    reads = [FastqRead(f"u{i}", "".join(rng.choice(list("ACGT"), 90)),
                       "I" * 90) for i in range(20)]
    fq = str(tmp_path / "u.fq")
    write_fastq(fq, reads)
    rc = main(["--action", "HLA", "--FASTQU", fq, "--graph", pkg_dir,
               "--sampleID", "S1", "--workingDir", str(tmp_path),
               "--outputDirectory", str(tmp_path / "outw")])
    assert rc == 0
    err = capsys.readouterr()
    out_all = err.out + err.err
    assert "unpaired minimum" in out_all and "WARNING" in out_all


def test_remap_and_reduce_action(tmp_path, rng):
    """--action remapAndReduce: WGS BAM in -> PRG-coordinate BAM out
    (Perl/remapAndReduce.pl workflow)."""
    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    out = str(tmp_path / "remapped.bam")
    assert main(["--action", "remapAndReduce", "--BAM", bam_path,
                 "--graph", pkg_dir, "--out", out]) == 0
    from hla_la_tpu.io.bam import BamReader
    rd = BamReader(out)
    recs = list(rd)
    assert rd.references[0][0] == "PRG"
    assert recs and all(a.pos <= b.pos for a, b in zip(recs, recs[1:]))


def test_downsample_bam_action(tmp_path, rng):
    pkg_dir, bam_path = _bam_world(tmp_path, rng)
    out = str(tmp_path / "ds.bam")
    assert main(["--action", "downsampleBAM", "--BAM", bam_path,
                 "--out", out, "--fraction", "0.5", "--seed", "7"]) == 0
    from hla_la_tpu.io.bam import BamReader
    n_in = len(list(BamReader(bam_path)))
    n_out = len(list(BamReader(out)))
    assert 0 < n_out < n_in
    # gigabase-target form (downsample_WGS_BAMs.pl semantics)
    outdir = str(tmp_path / "batch")
    assert main(["--action", "downsampleBAM", "--BAM", bam_path,
                 "--out", outdir, "--targetGigabases", "1.0"]) == 0
    import glob
    assert glob.glob(outdir + "/d_*.bam")
    # exactly one of --fraction/--targetGigabases is required
    import pytest
    with pytest.raises(SystemExit):
        main(["--action", "downsampleBAM", "--BAM", bam_path, "--out", out])
