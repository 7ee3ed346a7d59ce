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
    assert report.n_samples == 1
    assert report.total_accuracy == 1.0
    # all three resolutions perfect on concordant data
    for res in ("2digit", "4digit", "G"):
        assert report.accuracy(res) == 1.0
    assert not report.discordant
    for fn in ("validation_report.txt", "validation_calibration.txt",
               "validation_allele_stats.txt"):
        assert os.path.exists(tmp_path / "valout" / fn)
    summary = (tmp_path / "valout" / "validation_report.txt").read_text()
    assert "Accuracy_2digit" in summary and "Accuracy_G" in summary
    inferred = read_inferred_bestguess(
        str(tmp_path / "valout" / "S1" / "hla" / "R1_bestguess.txt"))
    assert "A" in inferred


def test_cohort_validation_discordant_pileup_analysis(tmp_path):
    """A sample whose truth table deliberately disagrees with the reads:
    the harness must flag the discordant locus, keep the others perfect,
    bucket the call in the calibration table, and write a pileup-based
    error analysis listing the columns where inferred and 'true' alleles
    disagree (HLAtypeinference_validation.pl:826-1000)."""
    rng = np.random.default_rng(21)
    sim = simulate_prg_package(rng, backbone_length=1800, n_haplotypes=4)
    pkg = sim.write_package(str(tmp_path / "g"))
    rs = ReadSimulator(rng, read_length=90, fragment_mean=280,
                       fragment_sd=25)
    bam_path = str(tmp_path / "S2.bam")
    w = BamWriter(bam_path, [("chr6", 100000)])
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        for p in rs.simulate_pairs_from_string(seq, levels, 12.0,
                                               name_prefix=f"h{h}"):
            for mate_flag, r in ((FLAG_READ1, p.r1), (FLAG_READ2, p.r2)):
                seq_o, qual = r.seq, r.qual
                flag = FLAG_PAIRED | mate_flag
                if r.reverse:
                    seq_o, qual = revcomp(seq_o), qual[::-1]
                    flag |= FLAG_REVERSE
                w.write(BamRecord(name=r.name, flag=flag, ref_id=0,
                                  pos=max(r.start_pos, 0), mapq=60,
                                  cigar=[(len(seq_o), 0)], seq=seq_o,
                                  qual=qual))
    w.close()
    sheet = tmp_path / "validationBAMs.txt"
    sheet.write_text(f"S2 {bam_path}\n")
    # truth wrong at locus A (A*07:01 instead of A*03:01), right at B
    truth = tmp_path / "truth.txt"
    truth.write_text("IndividualID\tA\tA\tB\tB\n"
                     "S2\tA*02:01\tA*07:01\tB*02:01\tB*03:01\n")
    report = validate_cohort(pkg, read_sample_sheet(str(sheet)),
                             str(truth), str(tmp_path / "valout"))
    assert report.per_locus["B"].correct["4digit"] == 2
    assert report.per_locus["A"].correct["4digit"] == 1
    assert len(report.discordant) == 1
    assert report.discordant[0][1] == "A"
    # calibration has both correct and incorrect entries
    ok = [o for _, o in report.calibration]
    assert any(ok) and not all(ok)
    # per-allele stats track the bad truth allele
    assert report.truth_stats[("A", "A*07:01")]["incorrect"] == 1
    # pileup analysis file written with disagreeing columns
    pa = tmp_path / "valout" / "pileup_analysis_S2_A.txt"
    assert pa.exists()
    lines = pa.read_text().splitlines()
    assert len(lines) > 2, "expected disagreeing columns"
    assert "Inferred" in lines[0] or "Inferred1" in lines[1]


def test_pileup_analysis_corrupted_pileup_raises(tmp_path):
    """A corrupted R1_pileup file must raise, not be silently skipped:
    validate_cohort's error handling is narrowed to FileNotFoundError
    (missing sample dirs), so internal regressions fail loudly (SURVEY §5
    failure-detection discipline)."""
    import pytest

    from hla_la_tpu.validation import pileup_error_analysis

    rng = np.random.default_rng(33)
    sim = simulate_prg_package(rng, backbone_length=1200, n_haplotypes=4)
    pkg = sim.write_package(str(tmp_path / "g"))
    sample_out = tmp_path / "S1"
    (sample_out / "hla").mkdir(parents=True)
    (sample_out / "hla" / "R1_pileup_A.txt").write_text(
        "0\tnot_an_int\t5\tgarbage\n")
    with pytest.raises(ValueError):
        pileup_error_analysis(pkg, str(sample_out), "A",
                              ("A*01:01", "A*02:01"),
                              ("A*03:01", "A*04:01"),
                              str(tmp_path / "out.txt"))


def test_sample_sheet_simple_tab_format_keeps_ids(tmp_path):
    """A plain 'sampleID<TAB>path' sheet must keep its IDs verbatim — the
    cohort heuristic only engages on >=3-column rows (the real
    validationBAMs.txt always carries label/technology columns)."""
    from hla_la_tpu.validation import read_sample_sheet
    p = tmp_path / "sheet.txt"
    p.write_text("NA12878\t/data/NA12878.bam\n"
                 "S2 /x/merged.bam\n"
                 "1000G\t/d/HG1.bam\t\t\t\n")
    rows = read_sample_sheet(str(p))
    assert rows == [("NA12878", "/data/NA12878.bam"),
                    ("S2", "/x/merged.bam"),
                    ("1000G_HG1", "/d/HG1.bam")], rows
    # 2-field tab rows keep BOTH fields verbatim (spaces included)
    p2 = p.parent / "sheet2.txt"
    p2.write_text("S3\t/data/my run/x.bam\nmy sample\t/x.bam\n")
    assert read_sample_sheet(str(p2)) == [
        ("S3", "/data/my run/x.bam"), ("my sample", "/x.bam")]
