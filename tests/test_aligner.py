"""End-to-end read alignment on a simulated package (build plan step 3-5):
the testPRGMapping / testAlignments2Chains analogue — simulated reads with
known truth levels must align back to their true graph coordinates
(HLA-LA.cpp:1533-1732)."""

import numpy as np
import pytest

from hla_la_tpu.graph.package import GraphPackage
from hla_la_tpu.models.aligner import ReadAligner, insert_size_from_histogram
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator
from hla_la_tpu.sim.truth import TrueReadLevels


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(777)
    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=4)
    pkg = sim.write_package(str(tmp_path_factory.mktemp("pkg") / "g"))
    return rng, sim, pkg


def _simulate(world, coverage=4.0, with_error=True, hap=1):
    rng, sim, pkg = world
    seq, levels = sim.linearized(hap)
    rs = ReadSimulator(rng, read_length=75, with_error=with_error,
                       fragment_mean=260, fragment_sd=25)
    return rs.simulate_pairs_from_string(seq, levels, coverage)


def test_alignment_truth_accuracy_no_error(world):
    rng, sim, pkg = world
    pairs_sim = _simulate(world, with_error=False)
    aligner = ReadAligner(pkg)
    truth = TrueReadLevels({})
    for p in pairs_sim:
        truth.truth[p.r1.name + "/1"] = p.r1.levels
        truth.truth[p.r2.name + "/2"] = p.r2.levels
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs_sim]
    aligned = aligner.align_pairs(fq, insert_mean=260, insert_sd=25,
                                  truth=truth)
    assert len(aligned) >= 0.9 * len(fq)
    assert truth.total > 0
    assert truth.accuracy() > 0.97


def test_alignment_truth_accuracy_with_error(world):
    rng, sim, pkg = world
    pairs_sim = _simulate(world, with_error=True)
    aligner = ReadAligner(pkg)
    truth = TrueReadLevels({})
    for p in pairs_sim:
        truth.truth[p.r1.name + "/1"] = p.r1.levels
        truth.truth[p.r2.name + "/2"] = p.r2.levels
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs_sim]
    aligned = aligner.align_pairs(fq, insert_mean=260, insert_sd=25,
                                  truth=truth)
    assert len(aligned) >= 0.85 * len(fq)
    assert truth.accuracy() > 0.95


def test_alignment_concordance_and_scores(world):
    rng, sim, pkg = world
    pairs_sim = _simulate(world, with_error=False, coverage=1.0)
    aligner = ReadAligner(pkg)
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs_sim]
    aligned = aligner.align_pairs(fq, insert_mean=260, insert_sd=25)
    assert aligned
    for ap in aligned[:10]:
        for ch in (ap.chain1, ap.chain2):
            assert 0 <= ch.mapq <= 1
            assert ch.mapq_per_pos is not None
            assert len(ch.mapq_per_pos) == ch.n_columns
            assert ch.log_likelihood <= 0
            # error-free reads must have high per-column likelihood
            assert ch.log_likelihood / max((ch.seq_c != ord("_")).sum(), 1) > -0.2


def test_insert_size_estimation(world):
    rng, sim, pkg = world
    pairs_sim = _simulate(world, coverage=3.0, with_error=False)
    aligner = ReadAligner(pkg)
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs_sim]
    mean, sd = aligner.estimate_insert_size(fq)
    # fragment 260 => inner distance = 260 - 2*75 = 110
    assert abs(mean - 110) < 30
    assert 0 < sd < 80


def test_insert_size_histogram_rule():
    hist = {100: 1.0, 110: 2.0, 120: 4.0, 130: 2.0, 140: 1.0}
    mean, sd = insert_size_from_histogram(hist)
    assert mean == 120
    assert sd == 10


def test_jax_backend_matches_numpy(world):
    rng, sim, pkg = world
    pairs_sim = _simulate(world, coverage=0.5, with_error=False)
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs_sim]
    a_np = ReadAligner(pkg, use_jax=False)
    a_jx = ReadAligner(pkg, use_jax=True)
    out_np = a_np.align_pairs(fq, insert_mean=260, insert_sd=25)
    out_jx = a_jx.align_pairs(fq, insert_mean=260, insert_sd=25)
    assert len(out_np) == len(out_jx)
    for x, y in zip(out_np, out_jx):
        assert x.read_id == y.read_id
        assert x.chain1.log_likelihood == pytest.approx(y.chain1.log_likelihood)
        np.testing.assert_array_equal(x.chain1.levels, y.chain1.levels)
