"""linearALTs / KIR module tests: diploid ALT-pair recovery on simulated
reads (reference: linearALTs.h:26-41, `--action KIR`)."""

import numpy as np
import pytest

from hla_la_tpu.io.fastq import FastqRead
from hla_la_tpu.models.linear_alts import LinearALTsTyper
from hla_la_tpu.sim.read_sim import ReadSimulator


@pytest.fixture(scope="module")
def alt_world():
    rng = np.random.default_rng(2026)
    L = 1500
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, L))
    haps = {}
    for hi in range(5):
        s = list(base)
        for _ in range(25):
            p = int(rng.integers(0, L))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        haps[f"ALT{hi}"] = "".join(s)
    return rng, haps


def _sim_reads(rng, seq, coverage, prefix):
    rs = ReadSimulator(rng, read_length=90, fragment_mean=280, fragment_sd=25)
    levels = np.arange(len(seq))
    pairs = rs.simulate_pairs_from_string(seq, levels, coverage,
                                          name_prefix=prefix)
    out = []
    for p in pairs:
        out.append(p.r1.to_fastq())
        out.append(p.r2.to_fastq())
    return out


def test_diploid_alt_recovery(alt_world):
    rng, haps = alt_world
    reads = (_sim_reads(rng, haps["ALT1"], 8.0, "a") +
             _sim_reads(rng, haps["ALT3"], 8.0, "b"))
    typer = LinearALTsTyper(haps)
    res = typer.type_diploid(reads)
    assert {res.hap1, res.hap2} == {"ALT1", "ALT3"}
    assert res.posterior > 0.5


def test_homozygous_alt(alt_world):
    rng, haps = alt_world
    reads = _sim_reads(rng, haps["ALT2"], 12.0, "h")
    typer = LinearALTsTyper(haps)
    res = typer.type_diploid(reads)
    assert res.hap1 == "ALT2" and res.hap2 == "ALT2"


def test_reads_to_genes(alt_world):
    rng, haps = alt_world
    genes = {"KIR2DL1": (0, 700), "KIR3DL2": (700, 1500)}
    typer = LinearALTsTyper(haps, genes=genes)
    reads = _sim_reads(rng, haps["ALT0"], 4.0, "g")
    assignment = typer.reads_to_genes(reads)
    total = sum(len(v) for v in assignment.values())
    assert total >= 0.8 * len(reads)
    assert len(assignment["KIR2DL1"]) > 0
    assert len(assignment["KIR3DL2"]) > 0


def test_type_diploid_paired_insert_term(rng):
    """The insert-size term must discriminate haplotypes that score equally
    per-mate: an ALT with an insertion between the mates stretches the
    apparent fragment and should lose to the true pair."""
    import numpy as np
    from hla_la_tpu.io.fastq import FastqRead
    from hla_la_tpu.models.linear_alts import LinearALTsTyper

    base = "".join(rng.choice(list("ACGT"), 900))
    # hapB: same sequence with 240bp inserted in the middle
    ins = "".join(rng.choice(list("ACGT"), 240))
    hapA = base
    hapB = base[:450] + ins + base[450:]
    typer = LinearALTsTyper({"A": hapA, "B": hapB})
    pairs = []
    frag, rl = 300, 80
    for i, s in enumerate(range(0, 900 - frag - 1, 37)):
        r1 = hapA[s:s + rl]
        r2s = hapA[s + frag - rl:s + frag]
        # mate 2 given reverse-complemented like a real fragment
        rc = r2s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        pairs.append((FastqRead(f"p{i}/1", r1, "I" * rl),
                      FastqRead(f"p{i}/2", rc, "I" * rl)))
    res = typer.type_diploid_paired(pairs, insert_mean=frag, insert_sd=25)
    assert {res.hap1, res.hap2} == {"A"}
    # sanity: without the insert term the mid-spanning haplotype pair is
    # closer; with it, A/A must beat A/B decisively
    names = res.hap_names
    ia, ib = names.index("A"), names.index("B")
    assert res.pair_ll[ia, ia] > res.pair_ll[min(ia, ib), max(ia, ib)]


def _mk_kir_panel(rng, n_haps=4, L=2400):
    """Aligned ALT haplotypes with two annotated genes + indel columns."""
    base = list("".join("ACGT"[i] for i in rng.integers(0, 4, L)))
    haps = {}
    for hi in range(n_haps):
        s = list(base)
        for _ in range(40):
            p = int(rng.integers(0, L))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        if hi % 2 == 1:  # an aligned deletion
            for p in range(1200, 1210):
                s[p] = "-"
        haps[f"KIR_ALT{hi}"] = "".join(s)
    ann = {h: [("KIR2DL1", 300, 700), ("KIR3DL2", 1500, 2000)]
           for h in haps}
    return haps, ann


def test_kir_package_build_and_load(tmp_path, rng):
    from hla_la_tpu.models.kir_package import KirPackage, build_kir_package
    haps, ann = _mk_kir_panel(rng)
    pkg = build_kir_package(str(tmp_path / "kir"), haps, ann,
                            covered_regions={"chr19": (54000000, 54400000)})
    assert sorted(pkg.genes()) == ["KIR2DL1", "KIR3DL2"]
    assert len({len(s) for s in pkg.haplotypes.values()}) == 1
    assert "N" in pkg.haplotypes["KIR_ALT1"]  # gap -> N
    assert pkg.covered_regions["chr19"] == (54000000, 54400000)
    # gene PRG package is a loadable graph package
    from hla_la_tpu.graph.package import GraphPackage
    gp = GraphPackage(pkg.gene_graph_dir)
    assert gp.sequences()
    # reload round-trip
    pkg2 = KirPackage.load(str(tmp_path / "kir"))
    assert pkg2.haplotypes == pkg.haplotypes
    assert pkg2.annotations == pkg.annotations


def test_kir_workflow_bam_to_calls(tmp_path, rng):
    """--action KIR with a package dir + BAM: region extraction, insert
    estimation from TLEN, haplotype pair + reads2Genes outputs
    (HLA-LA.cpp:812-905 workflow)."""
    import os

    from hla_la_tpu.cli import main
    from hla_la_tpu.io.bam import (BamRecord, BamWriter, FLAG_PAIRED,
                                   FLAG_READ1, FLAG_READ2, FLAG_REVERSE)
    from hla_la_tpu.models.kir_package import build_kir_package
    from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp

    haps, ann = _mk_kir_panel(rng)
    pkg_dir = str(tmp_path / "kir")
    build_kir_package(pkg_dir, haps, ann,
                      covered_regions={"chr19": (0, 100000)})
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=30)
    h1, h2 = "KIR_ALT1", "KIR_ALT3"
    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, [("chr19", 200000)])
    import numpy as np
    for h in (h1, h2):
        seq = haps[h].replace("-", "")
        for p in rs.simulate_pairs_from_string(
                seq, np.arange(len(seq)), 8.0, name_prefix=h):
            tlen = abs(p.r2.start_pos - p.r1.start_pos) + len(p.r2.seq)
            for mf, r, tl in ((FLAG_READ1, p.r1, tlen),
                              (FLAG_READ2, p.r2, -tlen)):
                s, q = r.seq, r.qual
                flag = FLAG_PAIRED | mf
                if r.reverse:
                    s, q, flag = revcomp(s), q[::-1], flag | FLAG_REVERSE
                w.write(BamRecord(name=r.name, flag=flag, ref_id=0,
                                  pos=max(r.start_pos, 0), mapq=60,
                                  cigar=[(len(s), 0)], seq=s, qual=q,
                                  tlen=tl))
    # decoy reads OUTSIDE the covered region — must be dropped at
    # extraction
    for j in range(25):
        s = "".join(rng.choice(list("ACGT"), 100))
        w.write(BamRecord(name=f"far{j}", flag=0, ref_id=0,
                          pos=150000 + j * 10, mapq=60, cigar=[(100, 0)],
                          seq=s, qual="I" * 100))
    w.close()

    out_dir = str(tmp_path / "kir_out")
    rc = main(["--action", "KIR", "--ALTpanel", pkg_dir, "--BAM", bam,
               "--sampleID", "K1", "--workingDir", str(tmp_path),
               "--outputDirectory", out_dir])
    assert rc == 0
    hap_call = open(os.path.join(out_dir, "KIR_haplotypes.txt")
                    ).read().splitlines()
    called = set(hap_call[1].split("\t")[:2])
    assert called == {h1, h2}, called
    r2g = open(os.path.join(out_dir, "reads2Genes.txt")).read()
    assert "KIR2DL1" in r2g and "KIR3DL2" in r2g
    assert "far0" not in r2g   # outside covered region


def test_kir_simulation_action_with_package(tmp_path, rng):
    from hla_la_tpu.cli import main
    from hla_la_tpu.models.kir_package import build_kir_package
    haps, ann = _mk_kir_panel(rng)
    pkg_dir = str(tmp_path / "kir")
    build_kir_package(pkg_dir, haps, ann)
    rc = main(["--action", "KIRsimulation", "--ALTpanel", pkg_dir,
               "--seed", "5"])
    assert rc == 0


def test_deletion_haplotype_homozygous_call(tmp_path, rng):
    """A haplotype whose own aligned deletion is stored as N in the
    equal-length block must still win a homozygous call: gap placeholders
    are stripped before alignment (an N run is an NW wall, so
    deletion-spanning reads used to score better on OTHER haplotypes and
    flipped the call to a confident wrong het — caught by the randomized
    soak, seed 5002)."""
    import os

    import numpy as np

    from hla_la_tpu.cli import main
    from hla_la_tpu.io.bam import BamRecord, BamWriter, FLAG_PAIRED, \
        FLAG_READ1, FLAG_READ2
    from hla_la_tpu.models.kir_package import build_kir_package
    from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp

    base = list("".join("ACGT"[i] for i in rng.integers(0, 4, 2400)))
    haps = {}
    for hi in range(4):
        s = list(base)
        for _ in range(40):
            p = int(rng.integers(0, 2400))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        haps[f"KIR_ALT{hi}"] = "".join(s)
    # the TRUTH haplotype carries the deletion
    s = list(haps["KIR_ALT3"])
    for p in range(1100, 1108):
        s[p] = "-"
    haps["KIR_ALT3"] = "".join(s)
    ann = {h: [("KIR2DL1", 300, 700)] for h in haps}
    pkg_dir = str(tmp_path / "kir")
    build_kir_package(pkg_dir, haps, ann,
                      covered_regions={"chr19": (0, 100000)})
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=30)
    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, [("chr19", 200000)])
    seq = haps["KIR_ALT3"].replace("-", "")
    for rep in range(2):   # homozygous: both chromosomes are ALT3
        for p in rs.simulate_pairs_from_string(
                seq, np.arange(len(seq)), 8.0, name_prefix=f"c{rep}"):
            tlen = abs(p.r2.start_pos - p.r1.start_pos) + len(p.r2.seq)
            for mf, r, tl in ((FLAG_READ1, p.r1, tlen),
                              (FLAG_READ2, p.r2, -tlen)):
                sq, q = r.seq, r.qual
                flag = FLAG_PAIRED | mf
                if r.reverse:
                    sq, q, flag = revcomp(sq), q[::-1], flag | 0x10
                w.write(BamRecord(name=r.name, flag=flag, ref_id=0,
                                  pos=max(r.start_pos, 0), mapq=60,
                                  cigar=[(len(sq), 0)], seq=sq, qual=q,
                                  tlen=tl))
    w.close()
    out_dir = str(tmp_path / "out")
    rc = main(["--action", "KIR", "--ALTpanel", pkg_dir, "--BAM", bam,
               "--sampleID", "K", "--workingDir", str(tmp_path),
               "--outputDirectory", out_dir])
    assert rc == 0
    called = open(os.path.join(out_dir, "KIR_haplotypes.txt")
                  ).read().splitlines()[1].split("\t")[:2]
    assert called == ["KIR_ALT3", "KIR_ALT3"], called
