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
