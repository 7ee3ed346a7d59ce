"""HLA-ASM assembly typing tests: contigs carrying a known allele must be
called as that allele by min edit distance (HLA-ASM.pl semantics)."""

import os

import numpy as np
import pytest

from hla_la_tpu.models.asm import AssemblyTyper
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import revcomp


@pytest.fixture(scope="module")
def asm_world(tmp_path_factory):
    rng = np.random.default_rng(99)
    sim = simulate_prg_package(rng, backbone_length=2000, n_haplotypes=4)
    pkg = sim.write_package(str(tmp_path_factory.mktemp("asm") / "pkg"))
    return rng, sim, pkg


def test_assembly_typing(asm_world, tmp_path):
    rng, sim, pkg = asm_world
    # contig = full haplotype 2 sequence (gapless): carries alleles *03:01
    seq, _ = sim.linearized(2)
    typer = AssemblyTyper(pkg)
    calls = typer.type_contigs({"contig_h2": seq})
    assert calls, "no gene hits on contig"
    by_locus = {c.locus: c for c in calls}
    for locus in ("A", "B"):
        assert locus in by_locus
        c = by_locus[locus]
        assert c.allele == f"{locus}*03:01", (c.allele, c.edit_distance)
        assert c.edit_distance == 0
    typer.write_outputs(calls, str(tmp_path / "asm_out"))
    assert os.path.exists(tmp_path / "asm_out" / "summary.txt")
    assert os.path.exists(tmp_path / "asm_out" / "genePositions.tab")


def test_assembly_typing_reverse_contig(asm_world):
    rng, sim, pkg = asm_world
    seq, _ = sim.linearized(1)
    typer = AssemblyTyper(pkg)
    calls = typer.type_contigs({"rc": revcomp(seq)})
    by_locus = {c.locus: c for c in calls}
    assert by_locus, "no calls on reverse contig"
    for locus, c in by_locus.items():
        assert c.allele == f"{locus}*02:01"


def test_assembly_typing_mutated_contig(asm_world):
    rng, sim, pkg = asm_world
    seq, levels = sim.linearized(3)
    s = list(seq)
    # mutate 2 bases outside any exon probe start (random; edit distance small)
    for _ in range(2):
        p = int(rng.integers(100, len(s) - 100))
        s[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[s[p]]
    typer = AssemblyTyper(pkg)
    calls = typer.type_contigs({"mut": "".join(s)})
    assert calls
    for c in calls:
        assert c.edit_distance <= 2
        assert c.allele.endswith("04:01") or c.edit_distance <= 2


def test_assembly_truth_comparison_and_gene_positions(asm_world, tmp_path):
    """Truth-comparison mode + reference-coordinate genePositions.tab
    (HLA-ASM.md:51-66 contract; VERDICT r1 item 6)."""
    rng, sim, pkg = asm_world
    seq, _ = sim.linearized(2)
    typer = AssemblyTyper(pkg)
    truth = {"A": ("A*03:01", "A*05:01"), "B": ("B*03:01", "B*07:01")}
    calls = typer.type_contigs({"contig_h2": seq}, truth=truth)
    by_locus = {c.locus: c for c in calls}
    for locus in ("A", "B"):
        c = by_locus[locus]
        # assembly IS the truth allele -> distance 0, which-allele correct
        assert c.min_dist_assembly_truth == 0
        assert f"{locus}*03:01" in c.min_dist_assembly_truth_alleles
        assert c.min_dist_called_truth == 0
        assert any(p.startswith(f"{locus}*03:01/")
                   for p in c.min_dist_called_truth_pairs)
        assert c.components  # exons used are reported
    out = tmp_path / "asm_truth_out"
    typer.write_outputs(calls, str(out), contigs={"contig_h2": seq})
    summary = (out / "summary.txt").read_text().splitlines()
    assert summary[0].split("\t") == [
        "contigID", "locus", "calledGenotypes", "components",
        "editDistance_calledGenotypes_assembly",
        "minEditDistance_assembly_truth",
        "minEditDistance_calledGenotype_truth",
        "minEditDistance_assembly_truth_whichAlleles",
        "minEditDistance_calledGenotype_truth_whichAlleles"]
    assert len(summary) >= 3
    gp = (out / "genePositions.tab").read_text().splitlines()
    assert gp[0].split("\t")[:6] == ["Locus", "Exon", "Contig",
                                     "ContigStart", "ContigStop", "Strand"]
    # every called locus reports both exons with sane contig coordinates
    rows = [l.split("\t") for l in gp[1:]]
    assert {r[0] for r in rows} == {"A", "B"}
    for r in rows:
        assert int(r[3]) >= 0 and int(r[4]) > int(r[3])
        # located against a linearized haplotype with a position
        assert r[6] != "" and int(r[7]) >= 0


def test_assembly_diverged_allele_multiprobe(asm_world):
    """A contig whose gene is a held-out mutated allele (not the probe)
    must still be located and called at small distance — the multi-probe
    location (single-probe missed diverged genes, VERDICT r1 weak #7)."""
    rng2 = np.random.default_rng(1234)
    sim2 = simulate_prg_package(rng2, backbone_length=2400, n_haplotypes=4,
                                n_gene_alleles=12, allele_snp_rate=0.04)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        pkg2 = sim2.write_package(td + "/pkg")
        # build a contig carrying allele A*09:01 (mutated, not in panel):
        # splice its exons into haplotype 1's row
        cols = [i for i, n in enumerate(sim2.column_names)
                if "_gene_A_" in n and "_exon_" in n]
        row = list(sim2.haplotypes[1])
        combined = sim2.gene_alleles["A"]["A*09:01"]
        for idx, col in enumerate(cols):
            row[col] = combined[idx]
        contig = "".join(ch for ch in row if ch != "_")
        typer2 = AssemblyTyper(pkg2)
        calls = typer2.type_contigs({"novel": contig})
        by_locus = {c.locus: c for c in calls}
        assert "A" in by_locus, "diverged gene not located"
        assert "A*09:01" in by_locus["A"].alleles_at_min
        assert by_locus["A"].edit_distance == 0
