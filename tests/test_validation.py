"""Nomenclature compat + truth evaluation + cohort validation harness
(simpleHLA.pm / evaluate_HLA_types / HLAtypeinference_validation.pl)."""

import os

import numpy as np
import pytest

from hla_la_tpu.io.bam import BamRecord, BamWriter, FLAG_PAIRED, FLAG_READ1, \
    FLAG_READ2, FLAG_REVERSE
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp
from hla_la_tpu.utils.nomenclature import (allele_list_compatible,
                                           alleles_compatible, evaluate_types,
                                           parse_allele,
                                           read_inferred_bestguess,
                                           read_truth_file)
from hla_la_tpu.validation import read_sample_sheet, validate_cohort
from hla_la_tpu.graph.package import GraphPackage


def test_parse_allele():
    assert parse_allele("A*02:01:01:02N") == ("A", ["02", "01", "01", "02"], "N")
    assert parse_allele("02:01") == ("", ["02", "01"], "")
    assert parse_allele("DRB1*15:01") == ("DRB1", ["15", "01"], "")


def test_alleles_compatible():
    assert alleles_compatible("A*02:01:01", "A*02:01", 2)
    assert not alleles_compatible("A*02:01", "A*02:02", 2)
    assert alleles_compatible("A*02:01", "A*02:05", 1)
    assert not alleles_compatible("A*02:01", "B*02:01", 2)
    assert allele_list_compatible("A*02:01;A*02:09", "A*02:09", 2)


def test_evaluate_types():
    truth = {"A": ("A*02:01", "A*03:01"), "B": ("B*07:02", "B*08:01")}
    inferred = {"A": ("A*03:01:01", "A*02:01:05"),
                "B": ("B*07:02", "B*44:02")}
    ev = evaluate_types(inferred, truth)
    assert ev.per_locus["A"] == 2      # crossed assignment
    assert ev.per_locus["B"] == 1
    assert ev.n_alleles_correct == 3


def test_truth_file_roundtrip(tmp_path):
    p = tmp_path / "truth.txt"
    p.write_text("IndividualID\tA\tA\tB\tB\n"
                 "S1\tA*02:01\tA*03:01\tB*07:02\tB*08:01\n")
    t = read_truth_file(str(p))
    assert t["S1"]["A"] == ("A*02:01", "A*03:01")
    assert t["S1"]["B"] == ("B*07:02", "B*08:01")


def test_cohort_validation_end_to_end(tmp_path):
    rng = np.random.default_rng(555)
    sim = simulate_prg_package(rng, backbone_length=1600, n_haplotypes=4)
    pkg = sim.write_package(str(tmp_path / "pkg"))
    # sample S1 = diploid haplotypes 1/2 -> alleles *02:01 / *03:01
    rs = ReadSimulator(rng, read_length=90, fragment_mean=280, fragment_sd=25)
    bam_path = str(tmp_path / "S1.bam")
    w = BamWriter(bam_path, [("chr6", 100000)])
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        for p in rs.simulate_pairs_from_string(seq, levels, 12.0,
                                               name_prefix=f"h{h}"):
            for mate_flag, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
                seq_o, qual = r.seq, r.qual
                flag = FLAG_PAIRED | mate_flag
                if r.reverse:
                    seq_o = revcomp(seq_o)
                    qual = qual[::-1]
                    flag |= FLAG_REVERSE
                w.write(BamRecord(name=r.name, flag=flag, ref_id=0,
                                  pos=max(r.start_pos, 0), mapq=60,
                                  cigar=[(len(seq_o), 0)], seq=seq_o,
                                  qual=qual))
    w.close()

    sheet = tmp_path / "validationBAMs.txt"
    sheet.write_text(f"S1 {bam_path}\n")
    truth = tmp_path / "truth.txt"
    truth.write_text("IndividualID\tA\tA\tB\tB\n"
                     "S1\tA*02:01\tA*03:01\tB*02:01\tB*03:01\n")
    samples = read_sample_sheet(str(sheet))
    report = validate_cohort(pkg, samples, str(truth),
                             str(tmp_path / "valout"))
    assert "S1" in report.per_sample
    assert report.total_accuracy == 1.0
    assert os.path.exists(tmp_path / "valout" / "validation_report.txt")
    inferred = read_inferred_bestguess(
        str(tmp_path / "valout" / "S1" / "hla" / "R1_bestguess.txt"))
    assert "A" in inferred
