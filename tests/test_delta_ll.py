"""Sparse-delta cluster LL parity (ops/pair_ll.cluster_read_ll_delta).

The IMGT-scale typing path replaces the dense one-hot sgemm of
cluster_read_ll with a consensus+delta evaluation (allele clusters of one
locus differ in a few % of columns — HLATyper.cpp:1198-1299).  This file
locks: delta-numpy vs the dense matmul, the native threaded kernel vs the
numpy delta reference, the preallocated column-slice `out=` path (the
page-fault-churn fix), and the typer-level dispatch forced onto a small
world (calls + posteriors must match the BLAS path).
"""

import numpy as np
import pytest

from hla_la_tpu import native
from hla_la_tpu.ops.pair_ll import (cluster_channel_codes, cluster_delta_plan,
                                    cluster_onehot, cluster_read_ll,
                                    cluster_read_ll_delta,
                                    cluster_read_ll_delta_numpy)

BASES = "ACGT_N"


def _world(rng, C=97, J=61, R=203, diff_rate=0.05):
    cons = rng.integers(0, 4, J)
    rows = np.tile(cons, (C, 1))
    for c in range(C):
        nd = int(rng.binomial(J, diff_rate))
        if nd:
            pos = rng.choice(J, size=nd, replace=False)
            rows[c, pos] = rng.integers(0, 6, nd)
    seqs = ["".join(BASES[i] for i in row) for row in rows]
    contrib = rng.normal(-1.0, 0.5, (R, J, 6)).astype(np.float32)
    mismatch = (rng.random((R, J, 6)) < 0.3).astype(np.float32)
    return seqs, contrib, mismatch


def _transpose(t):
    R, J, _ = t.shape
    return np.ascontiguousarray(t.transpose(1, 2, 0).reshape(J * 6, R))


def test_delta_numpy_matches_dense_matmul():
    rng = np.random.default_rng(101)
    seqs, contrib, mismatch = _world(rng)
    onehot = cluster_onehot(seqs)
    want_ll, want_mm = cluster_read_ll(onehot, contrib, mismatch,
                                       backend="numpy")
    ch = cluster_channel_codes(seqs)
    got_ll, got_mm = cluster_read_ll_delta_numpy(
        ch, _transpose(contrib), _transpose(mismatch))
    assert np.allclose(got_ll, want_ll, rtol=2e-5, atol=1e-4)
    # mismatch counts are small integers — must be exact
    assert np.array_equal(got_mm, want_mm)


def test_delta_plan_consensus_cluster_has_empty_range():
    """A cluster identical to the consensus gets an empty diff range (the
    native kernel memcpy's the base row for it)."""
    seqs = ["ACGT_N", "ACGT_N", "ACCT_N", "TCGT_N"]
    plan = cluster_delta_plan(cluster_channel_codes(seqs))
    ref, base_cols, plus_cols, minus_cols, starts = plan
    assert starts[0] == starts[1] == starts[2] == 0   # clusters 0,1 == ref
    assert starts[3] == 1 and starts[4] == 2
    assert len(plus_cols) == len(minus_cols) == 2


def test_delta_native_matches_numpy_reference():
    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(202)
    seqs, contrib, mismatch = _world(rng, C=64, J=80, R=150)
    ch = cluster_channel_codes(seqs)
    T, M = _transpose(contrib), _transpose(mismatch)
    want = cluster_read_ll_delta_numpy(ch, T, M)
    plan = cluster_delta_plan(ch)
    got = native.cluster_ll_delta(T, M, plan[1], plan[2], plan[3], plan[4])
    assert got is not None
    # identical math (f64 accumulation in the same order) — bit-exact
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])
    # ... for any thread count (each cluster row built by one thread)
    got4 = native.cluster_ll_delta(T, M, plan[1], plan[2], plan[3], plan[4],
                                   n_threads=4)
    assert np.array_equal(got4[0], want[0])


def test_delta_out_column_slice():
    """The chunked caller writes straight into column slices of the full
    [C, R_total] matrices (out_stride path)."""
    rng = np.random.default_rng(303)
    seqs, contrib, mismatch = _world(rng, C=32, J=40, R=96)
    ch = cluster_channel_codes(seqs)
    C, R = len(seqs), 96
    full_ll = np.full((C, 2 * R), np.nan, dtype=np.float32)
    full_mm = np.full((C, 2 * R), np.nan, dtype=np.float32)
    T, M = _transpose(contrib), _transpose(mismatch)
    want_ll, want_mm = cluster_read_ll_delta_numpy(ch, T, M)
    for impls in ("numpy", "native"):
        if impls == "native" and not native.available():
            continue
        full_ll.fill(np.nan)
        full_mm.fill(np.nan)
        fn = (cluster_read_ll_delta_numpy if impls == "numpy"
              else cluster_read_ll_delta)
        fn(ch, T, M, out_ll=full_ll[:, R:], out_mm=full_mm[:, R:])
        assert np.array_equal(full_ll[:, R:], want_ll), impls
        assert np.array_equal(full_mm[:, R:], want_mm), impls
        assert np.all(np.isnan(full_ll[:, :R])), impls


def test_typer_forced_delta_matches_blas_calls(tmp_path, monkeypatch):
    """End-to-end: forcing the sparse-delta dispatch on a small world must
    reproduce the BLAS path's calls and posteriors (values agree to f32
    sum-order tolerance; the 2e10 threshold keeps production small worlds
    byte-stable on BLAS)."""
    from hla_la_tpu.models.pipeline import run_hla_typing
    from hla_la_tpu.sim.graph_sim import simulate_prg_package
    from hla_la_tpu.sim.read_sim import ReadSimulator

    rng = np.random.default_rng(404)
    sim = simulate_prg_package(rng, backbone_length=1600, n_haplotypes=4,
                               snp_rate=0.012)
    pkg = sim.write_package(str(tmp_path / "pkg"))
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=25, with_error=True)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 15.0,
                                               name_prefix=f"hap{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]

    res_dense = run_hla_typing(pkg, pairs=fq,
                               output_dir=str(tmp_path / "out_dense"))
    monkeypatch.setattr("hla_la_tpu.models.typer.DELTA_DISPATCH_FLOPS", 0.0)
    res_delta = run_hla_typing(pkg, pairs=fq,
                               output_dir=str(tmp_path / "out_delta"))

    assert res_dense.results and len(res_dense.results) == \
        len(res_delta.results)
    for a, b in zip(res_dense.results, res_delta.results):
        assert (a.locus, a.allele1_id, a.allele2_id) == \
            (b.locus, b.allele1_id, b.allele2_id)
        assert abs(a.q1_allele1 - b.q1_allele1) < 1e-5
        assert abs(a.q1_allele2 - b.q1_allele2) < 1e-5
