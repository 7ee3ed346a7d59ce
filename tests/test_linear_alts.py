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
