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
