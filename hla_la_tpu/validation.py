"""Cohort validation harness.

Reference: HLAtypeinference_validation.pl (compare inferred vs truth HLA
types across cohorts at 2-/4-digit and G resolution) plus the batch drivers
Perl/applyToAllBAMs.pl / validationBAMs.txt.  Here: run the typing pipeline
over a sample sheet, evaluate against a truth table, and write a concordance
report."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .graph.package import GraphPackage
from .utils.nomenclature import (TypeEvaluation, evaluate_types,
                                 read_inferred_bestguess, read_truth_file)
from .utils.timing import log_progress


@dataclass
class CohortReport:
    per_sample: dict[str, TypeEvaluation] = field(default_factory=dict)

    @property
    def total_accuracy(self) -> float:
        tot = sum(e.n_alleles_total for e in self.per_sample.values())
        cor = sum(e.n_alleles_correct for e in self.per_sample.values())
        return cor / tot if tot else 0.0

    def write(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("SampleID\tLoci\tAllelesTotal\tAllelesCorrect\t"
                     "Accuracy\n")
            for sid, e in sorted(self.per_sample.items()):
                fh.write(f"{sid}\t{e.n_loci}\t{e.n_alleles_total}\t"
                         f"{e.n_alleles_correct}\t{e.accuracy:.4f}\n")
            fh.write(f"TOTAL\t\t\t\t{self.total_accuracy:.4f}\n")


def read_sample_sheet(path: str) -> list[tuple[str, str]]:
    """validationBAMs.txt format: 'sampleID <whitespace> bamPath' lines."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            f = line.split()
            if len(f) >= 2 and f[0].lower() not in ("sampleid",
                                                    "individualid"):
                out.append((f[0], f[1]))
    return out


def validate_cohort(pkg: GraphPackage, samples: list[tuple[str, str]],
                    truth_path: str, out_dir: str, backend: str = "numpy",
                    resolution: int = 2, use_g: bool = True) -> CohortReport:
    from .io.bam import bam_to_fastq_pairs, extract_reads
    from .models.pipeline import run_hla_typing

    truth_all = read_truth_file(truth_path)
    report = CohortReport()
    os.makedirs(out_dir, exist_ok=True)
    for sample_id, bam in samples:
        if sample_id not in truth_all:
            log_progress(f"{sample_id}: no truth, skipping")
            continue
        log_progress(f"validating {sample_id} <- {bam}")
        by_name, _contigs = extract_reads(bam, None)
        pairs, unpaired = bam_to_fastq_pairs(by_name)
        sample_out = os.path.join(out_dir, sample_id)
        run_hla_typing(pkg, pairs=pairs, unpaired=[],
                       output_dir=sample_out, backend=backend)
        bg = os.path.join(sample_out, "hla",
                          "R1_bestguess_G.txt" if use_g
                          else "R1_bestguess.txt")
        if use_g and (not os.path.exists(bg)
                      or len(open(bg).read().splitlines()) <= 1):
            bg = os.path.join(sample_out, "hla", "R1_bestguess.txt")
        inferred = read_inferred_bestguess(bg)
        report.per_sample[sample_id] = evaluate_types(
            inferred, truth_all[sample_id], resolution)
    report.write(os.path.join(out_dir, "validation_report.txt"))
    return report
