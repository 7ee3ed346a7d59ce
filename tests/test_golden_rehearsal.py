"""NA12878 golden dress rehearsal (VERDICT r2 item 4): the real golden
conformance test (tests/test_golden_na12878.py) is env-gated on a 2.3 GB
package that does not ship here, so its codepath had never executed.  This
file runs the EXACT same golden comparison (the shared
nomenclature.golden_g_mismatches) un-gated, on a mock NA12878:

  - a simulated package carrying ALL 17 real typing loci
    (utils/config.py LOCI_FOR_TYPING = HLATyper.cpp:42) with REAL IMGT
    allele names drawn from the real hla_nom_g.txt;
  - input packaged as a CRAM 3.1 (arith blocks + fqzcomp qualities + tok3
    names) consumed with --ref, like the reference's .mini.cram input
    (README.md:119-130);
  - a locally-generated golden table in the NA12878_example_output_G.txt
    format, built from the PLANTED truth alleles (not from the run).
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
NOM_G = os.path.join(REF, "hla_nom_g.txt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NOM_G),
    reason="reference mount with hla_nom_g.txt not available")


def _real_allele_names(n_per_locus: int) -> dict[str, list[str]]:
    """One member allele from each of the first n nomenclature lines per
    locus (format: 'LOCUS*;m1/m2/...;GGROUP') — G-group members AND
    singletons both translate perfectly (typer._load_g maps a singleton
    to itself)."""
    out: dict[str, list[str]] = {}
    with open(NOM_G) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split(";")
            if len(f) < 2:
                continue
            locus = f[0].rstrip("*")
            lst = out.setdefault(locus, [])
            if len(lst) < n_per_locus:
                lst.append(f"{locus}*{f[1].split('/')[0]}")
    return out


def test_golden_dress_rehearsal(tmp_path):
    from hla_la_tpu.cli import main
    from hla_la_tpu.io.bam import (FLAG_PAIRED, FLAG_READ1, FLAG_READ2,
                                   FLAG_REVERSE, BamRecord)
    from hla_la_tpu.io.cram import M_ARITH, M_FQZ, M_TOK3
    from hla_la_tpu.io.cram_write import write_cram
    from hla_la_tpu.models.typer import HLATyper
    from hla_la_tpu.sim.graph_sim import simulate_prg_package
    from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp
    from hla_la_tpu.utils.config import LOCI_FOR_TYPING
    from hla_la_tpu.utils.nomenclature import golden_g_mismatches

    rng = np.random.default_rng(128128)
    # all 17 real loci, evenly spaced on the backbone
    genes = {loc: (0.02 + i * 0.0565, 0.02 + i * 0.0565 + 0.036)
             for i, loc in enumerate(LOCI_FOR_TYPING)}
    real_names = _real_allele_names(12)
    # loci with too few real G groups (F has 2; DRA/H/K/V none) keep the
    # simulator's synthetic names and are excluded from the golden table
    named_loci = [l for l in LOCI_FOR_TYPING
                  if len(real_names.get(l, [])) >= 4]
    assert len(named_loci) >= 12, named_loci
    sim = simulate_prg_package(
        rng, backbone_length=14000, n_haplotypes=4, genes=genes,
        allele_names={l: real_names[l] for l in named_loci})
    pkg = sim.write_package(str(tmp_path / "g"))
    import shutil
    shutil.copy(NOM_G, os.path.join(pkg.dir, "hla_nom_g.txt"))
    os.makedirs(os.path.join(pkg.dir, "knownReferences"), exist_ok=True)
    with open(os.path.join(pkg.dir, "knownReferences", "mock.txt"),
              "w") as fh:
        fh.write("contigID\tcontigLength\tExtractCompleteContig\t"
                 "PartialExtraction_Start\tPartialExtraction_Stop\n")
        fh.write("chr6\t100000\t1\t\t\n")

    # diploid mock individual = haplotypes 1 + 2 -> real allele names
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=25, with_error=True)
    records = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        for p in rs.simulate_pairs_from_string(seq, levels, 16.0,
                                               name_prefix=f"h{h}"):
            for mf, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
                s, q = r.seq, r.qual
                flag = FLAG_PAIRED | mf
                if r.reverse:
                    s, q = revcomp(s), q[::-1]
                    flag |= FLAG_REVERSE
                records.append(BamRecord(
                    name=r.name, flag=flag, ref_id=0,
                    pos=max(r.start_pos, 0), mapq=60,
                    cigar=[(len(s), 0)], seq=s, qual=q))
    ref_seq = "".join(rng.choice(list("ACGT"), 100000))
    cram = str(tmp_path / "mock_na12878.mini.cram")
    write_cram(cram, [("chr6", 100000)], records, {"chr6": ref_seq},
               method=M_ARITH, qual_method=M_FQZ, name_method=M_TOK3)
    fa = str(tmp_path / "genome.fa")
    with open(fa, "w") as fh:
        fh.write(">chr6\n" + ref_seq + "\n")

    # locally-generated golden table from the PLANTED truth: the expected
    # G call is the translation of the truth allele's DB CLUSTER (alleles
    # with identical typed-exon sequences merge — same clustering the
    # engine applies, HLATyper.cpp:1317-1372)
    typer = HLATyper(pkg)
    golden = str(tmp_path / "mock_golden_G.txt")
    n_golden = 0
    with open(golden, "w") as fh:
        fh.write("Locus\tChromosome\tAllele\tQ1\n")
        for locus in named_loci:
            if not typer.can_translate_locus(locus):
                continue
            _, _, _, combined = typer._combined_exon_matrix(locus)
            for chrom, h in ((1, 1), (2, 2)):
                truth = real_names[locus][h]
                members = sorted(a for a in combined
                                 if combined[a] == combined[truth])
                g, _ = typer.translate_to_g(members)
                fh.write(f"{locus}\t{chrom}\t{g}\t1\n")
            n_golden += 1
    assert n_golden >= 12, n_golden

    out_dir = str(tmp_path / "out")
    rc = main(["--action", "HLA", "--BAM", cram, "--ref", fa,
               "--graph", pkg.dir, "--sampleID", "mockNA12878",
               "--workingDir", str(tmp_path), "--outputDirectory", out_dir])
    assert rc == 0

    got_path = os.path.join(out_dir, "hla", "R1_bestguess_G.txt")
    assert os.path.exists(got_path)
    mismatches = golden_g_mismatches(golden, got_path)
    assert not mismatches, f"G-group call mismatches: {mismatches}"
