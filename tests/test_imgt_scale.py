"""IMGT-scale typing: the reference's defining workload is thousands of
alleles per class-I locus, clustered to C ~ 10^3 and pushed through the C^2
pair reduction (HLATyper.cpp:1198-1372 clustering, 2280-2364 pair loop;
SURVEY §7 risk (d): tile and stream).  Every other test runs at toy cluster
counts — this file locks the scaled-down working point (C >= 500 clusters,
R >= 10^3 reads) in-suite; stress_imgt.py runs the full C >= 2000 / R >= 10^4
version out-of-suite.
"""

import numpy as np
import pytest

from hla_la_tpu.models.pipeline import run_hla_typing
from hla_la_tpu.ops.pair_ll import (pair_ll_reduction,
                                    pair_ll_reduction_numpy)
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator


@pytest.fixture(scope="module")
def imgt_world(tmp_path_factory):
    """Dense-DB world: one locus, ~560 distinct alleles (C ~= 560 after
    clustering), deep targeted reads (R >= 1200 at the locus)."""
    rng = np.random.default_rng(20260819)
    sim = simulate_prg_package(rng, backbone_length=3000, n_haplotypes=6,
                               snp_rate=0.01,
                               genes={"A": (0.20, 0.38)},
                               n_gene_alleles=560, allele_snp_rate=0.02)
    pkg = sim.write_package(str(tmp_path_factory.mktemp("imgt") / "pkg"))
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=25, with_error=True)
    # targeted deep sequencing of the gene window (exon capture analogue):
    # slice the gene +- 250 so nearly every read can touch the exons
    gene_cols = [i for i, n in enumerate(sim.column_names)
                 if "_gene_A_" in n]
    lo_col, hi_col = min(gene_cols), max(gene_cols)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        sel = (levels >= lo_col - 250) & (levels <= hi_col + 250)
        idx = np.nonzero(sel)[0]
        sub_seq = seq[idx[0]:idx[-1] + 1]
        sub_levels = levels[idx[0]:idx[-1] + 1]
        pairs += rs.simulate_pairs_from_string(sub_seq, sub_levels, 160.0,
                                               name_prefix=f"h{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    out = str(tmp_path_factory.mktemp("imgt") / "out")
    res = run_hla_typing(pkg, pairs=fq, output_dir=out)
    return sim, res, out


def test_imgt_scale_exact_call(imgt_world):
    """Planted truth must survive a 560-allele DB at deep coverage: the two
    simulated haplotypes' alleles win against ~558 decoys that differ by a
    handful of SNPs each."""
    sim, res, out = imgt_world
    r = {x.locus: x for x in res.results}["A"]
    called = {r.allele1_id.split(";")[0], r.allele2_id.split(";")[0]}
    assert called == {"A*02:01", "A*03:01"}, called
    assert r.q1_allele1 > 0.9 and r.q1_allele2 > 0.9


def test_imgt_scale_working_point(imgt_world):
    """The run actually exercised the scale this file exists for."""
    sim, res, out = imgt_world
    r = {x.locus: x for x in res.results}["A"]
    assert r.n_clusters >= 500, r.n_clusters
    assert r.n_reads_used >= 1000, r.n_reads_used
    # the C^2 posterior dump carries all C(C+1)/2 pairs (reference
    # contract, HLATyper.cpp:2452-2466)
    import os
    n_pairs = r.n_clusters * (r.n_clusters + 1) // 2
    with open(os.path.join(out, "hla", "R1_PP_A_pairs.txt")) as fh:
        n_lines = sum(1 for _ in fh)
    assert n_lines == n_pairs + 1


def test_imgt_scale_qc_sane(imgt_world):
    """filterFirst20 / low-frequency filters / QC behave at depth: the
    allele-plausibility filter (top-20 obs per position define the
    plausible genotypes; it does NOT subsample coverage) leaves deep
    coverage intact, the error rate stays calibrated, and no column is
    unaccounted for the winning alleles."""
    sim, res, out = imgt_world
    r = {x.locus: x for x in res.results}["A"]
    assert r.avg_coverage > 200, r.avg_coverage   # deep targeted world
    assert r.min_coverage > 0
    assert 0 <= r.avg_column_error < 0.05
    assert r.prop_kmers_covered_1 > 0.8
    assert r.n_columns_unaccounted == 0


def test_pair_reduction_numpy_jax_parity_at_scale():
    """numpy, jax and native pair reductions agree at C >= 500.  (The
    imgt_world fixture's typing run itself exercises the auto dispatch:
    its C^2 R ~ 4.6e8 crosses the large-job threshold.)"""
    rng = np.random.default_rng(11)
    C, R = 520, 120
    L = rng.normal(-40, 8, (C, R))
    want = pair_ll_reduction_numpy(L)
    got = pair_ll_reduction(L, backend="jax")
    assert np.allclose(got, want, rtol=1e-6, atol=1e-5)
    import hla_la_tpu.native as native
    if native.available():
        got_n = pair_ll_reduction(L, backend="native")
        assert np.allclose(got_n, want, rtol=1e-6, atol=1e-5)


def test_pair_reduction_native_softplus_cutoff_edges():
    """The native kernel's softplus shortcut (skip at |a-b| >= 17) and the
    f32 tail must stay within tolerance exactly at the cutoff and for tied
    likelihoods (d = 0)."""
    import hla_la_tpu.native as native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    rng = np.random.default_rng(12)
    C, R = 40, 333
    base = rng.normal(-40, 1, (1, R))
    # rows spaced so pairwise |a-b| sweeps through ~0..25 incl. exactly 17
    offsets = np.concatenate([np.zeros(1), np.linspace(0.0, 25.0, C - 2),
                              np.array([17.0])])
    L = base + offsets[:, None]
    want = pair_ll_reduction_numpy(L)
    got = native.pair_ll(L)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-3)


def test_pair_reduction_intermediate_stays_bounded():
    """At C ~ 2000 the jax scan must shrink its read chunk so the
    [C, C, chunk] intermediate stays ~0.5 GB (SURVEY §7(d) tile/stream):
    the compiled chunk for C=2000 is the memory bound, not the default."""
    # mirror the caller's chunk computation (pair_ll_reduction)
    C, R = 2000, 20000
    chunk = min(512, max(R, 1), max(1, int(1.3e8 // max(C * C, 1))))
    assert chunk * C * C <= 1.4e8
    assert chunk == 32
