"""Multi-character segment-matrix cells fail LOUDLY with the exact cell
named (VERDICT r4 weak #8 / next #7).

The reference concatenates per-column cells blindly
(HLATyper.cpp:1285-1297): a multi-char cell shifts every downstream
column->exonPosition mapping and positionally corrupts the typing matrix
without any error.  Our contract (documented in docs/COMPONENTS.md) is one
character per cell; violations raise ValueError naming file, allele and
column so first contact with a real package that breaks the assumption is
diagnosable, not a bare assert."""

import os

import numpy as np
import pytest

from hla_la_tpu.graph.package import GraphPackage
from hla_la_tpu.models.typer import HLATyper
from hla_la_tpu.sim.graph_sim import simulate_prg_package


@pytest.fixture(scope="module")
def pkg_dir(tmp_path_factory):
    rng = np.random.default_rng(55001)
    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=4,
                               snp_rate=0.01)
    d = str(tmp_path_factory.mktemp("segcell") / "pkg")
    sim.write_package(d)
    return d


def _corrupt_one_cell(pkg_dir: str, fn: str) -> tuple[str, int]:
    """Make one data cell two characters wide; return (allele, col_idx)."""
    path = os.path.join(pkg_dir, "PRG", fn)
    with open(path) as fh:
        lines = fh.read().splitlines()
    # first data row with a ':' allele id (the combined matrix only reads
    # those), widen its second column cell
    for i, line in enumerate(lines[1:], start=1):
        f = line.split(" ")
        if ":" in f[0]:
            col = min(2, len(f) - 1)
            f[col] = f[col] + "T"
            lines[i] = " ".join(f)
            with open(path, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            return f[0], col - 1
    raise AssertionError("no typed allele row found")


def test_multichar_cell_raises_with_diagnostics(pkg_dir):
    typer = HLATyper(GraphPackage(pkg_dir))
    locus = typer.loci[0]
    exon_fn = next(iter(typer.graph_genes[locus].values()))
    allele, col_idx = _corrupt_one_cell(pkg_dir, exon_fn)
    with pytest.raises(ValueError) as exc:
        typer._combined_exon_matrix(locus)
    msg = str(exc.value)
    assert exon_fn in msg
    assert allele in msg
    assert f"column {col_idx}" in msg
    assert "HLATyper.cpp" in msg  # points the reader at the reference quirk


def test_compensating_cell_errors_still_raise(tmp_path):
    """An empty cell + a 2-char cell in one row keep the aggregate length
    but still shift positions — the per-cell check must catch it."""
    rng = np.random.default_rng(55003)
    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=4,
                               snp_rate=0.01)
    d = str(tmp_path / "pkg")
    sim.write_package(d)
    typer = HLATyper(GraphPackage(d))
    locus = typer.loci[0]
    fn = next(iter(typer.graph_genes[locus].values()))
    path = os.path.join(d, "PRG", fn)
    lines = open(path).read().splitlines()
    for i, line in enumerate(lines[1:], start=1):
        f = line.split(" ")
        if ":" in f[0] and len(f) >= 4:
            f[1] = ""              # empty cell
            f[2] = f[2] + "T"      # compensating 2-char cell
            lines[i] = " ".join(f)
            break
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    typer2 = HLATyper(GraphPackage(d))
    with pytest.raises(ValueError, match="multi-character segment"):
        typer2._combined_exon_matrix(locus)


def test_clean_package_unaffected(pkg_dir):
    # the fixture is module-scoped and mutated above — rebuild clean
    rng = np.random.default_rng(55002)
    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=4,
                               snp_rate=0.01)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        d = os.path.join(td, "pkg")
        sim.write_package(d)
        typer = HLATyper(GraphPackage(d))
        locus = typer.loci[0]
        levels, exon_idx, exon_pos, combined = \
            typer._combined_exon_matrix(locus)
        assert len(combined) > 0
        assert len(levels) == len(exon_idx) == len(exon_pos)
