"""Simulator tests (build plan step 2): random PRG packages, read simulation,
truth-level bookkeeping."""

import numpy as np

from hla_la_tpu.graph.package import GraphPackage
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator, revcomp
from hla_la_tpu.sim.truth import TrueReadLevels


def test_simulated_prg_is_consistent(rng):
    sim = simulate_prg_package(rng, backbone_length=600)
    sim.prg.check_structure()
    assert sim.n_columns == sim.prg.n_levels - 1
    for h in sim.haplotypes:
        assert sim.prg.path_emits(h)


def test_package_write_and_reload(rng, tmp_path):
    sim = simulate_prg_package(rng, backbone_length=600)
    pkg = sim.write_package(str(tmp_path / "graphpkg"))
    loci = pkg.graph_loci()
    assert loci == sim.column_names
    prg2 = pkg.prg()
    prg2.check_structure()
    assert prg2.n_levels == sim.prg.n_levels
    # linearized haplotypes + translations round-trip
    fasta = pkg.prg_fasta()
    for i, s in enumerate(pkg.sequences()):
        seq, levels = sim.linearized(i)
        assert fasta[s.fasta_id] == seq
        np.testing.assert_array_equal(pkg.translation(s.prg_id), levels)
    # compiled cache reloads
    c = pkg.compiled()
    assert c.n_levels == sim.prg.n_levels


def test_segment_files_cover_all_columns(rng, tmp_path):
    sim = simulate_prg_package(rng, backbone_length=600)
    pkg = sim.write_package(str(tmp_path / "graphpkg"), compile_now=False)
    total_cols = 0
    for fn in pkg.segment_files():
        cols, rows = pkg.read_segment(fn)
        total_cols += len(cols)
        for allele, vals in rows.items():
            assert len(vals) == len(cols)
    assert total_cols == sim.n_columns


def test_read_simulator_no_error(rng):
    sim = simulate_prg_package(rng, backbone_length=600)
    seq, levels = sim.linearized(1)
    rs = ReadSimulator(rng, read_length=70, with_error=False,
                       fragment_mean=200, fragment_sd=10)
    pairs = rs.simulate_pairs_from_string(seq, levels, haploid_coverage=5.0)
    assert len(pairs) > 5
    for p in pairs[:20]:
        for r in (p.r1, p.r2):
            assert len(r.seq) == 70
            s = revcomp(r.seq) if r.reverse else r.seq
            lv = r.levels[::-1] if r.reverse else r.levels
            # without error every base matches the source at its level
            for i, base in enumerate(s):
                src_pos = np.searchsorted(levels, lv[i])
                assert levels[src_pos] == lv[i]
                assert seq[src_pos] == base


def test_truth_evaluation(rng):
    sim = simulate_prg_package(rng, backbone_length=600)
    seq, levels = sim.linearized(0)
    rs = ReadSimulator(rng, read_length=50, with_error=False)
    pairs = rs.simulate_pairs_from_string(seq, levels, haploid_coverage=2.0)
    truth = {p.r1.name + "/1": p.r1.levels for p in pairs}
    t = TrueReadLevels(truth)
    for p in pairs:
        t.evaluate(p.r1.name + "/1", p.r1.levels, p.r1.reverse)
    assert t.total > 0
    assert t.accuracy() == 1.0
