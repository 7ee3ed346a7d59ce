"""Parity lock: the vectorised per-locus observation builder
(HLATyper._collect_locus_obs — array concatenation over cached chain
records, ONE lexsort for removeDoublePositionsFromRead) must reproduce the
legacy ExonObs object path (_alignment_to_obs + _remove_double_positions +
_ObsSoA) field-for-field.  The object path is the direct transcription of
the reference semantics (HLATyper.cpp:3192-3566 pileup extraction,
2850-2920 double-position removal); the vectorised path is what production
runs."""

import numpy as np
import pytest

from hla_la_tpu.models.aligner import ReadAligner
from hla_la_tpu.models.typer import HLATyper, _ObsSoA
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator
from hla_la_tpu.utils.config import RunConfig


@pytest.fixture(scope="module")
def obs_world(tmp_path_factory):
    rng = np.random.default_rng(90125)
    sim = simulate_prg_package(rng, backbone_length=2400, n_haplotypes=5,
                               snp_rate=0.012)
    pkg_dir = str(tmp_path_factory.mktemp("obsvec") / "pkg")
    pkg = sim.write_package(pkg_dir)
    rs = ReadSimulator(rng, read_length=100, fragment_mean=320,
                       fragment_sd=30, with_error=True)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 10.0,
                                               name_prefix=f"hap{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    # a handful of unpaired reads exercise the unpaired branch
    unp = [p.r1.to_fastq() for p in pairs[:8]]
    from hla_la_tpu.graph.package import GraphPackage
    gp = GraphPackage(pkg_dir)
    aligner = ReadAligner(gp, RunConfig())
    im, isd = aligner.estimate_insert_size(fq)
    by_id = {ap.read_id: ap for ap in aligner.align_pairs(fq, im, isd)}
    aligned, kept = [], []
    for p in fq:
        ap = by_id.get(p[0].name)
        if ap is not None:
            aligned.append(ap)
            kept.append(p)
    unal = aligner.align_unpaired(unp)
    kept_u = [r for r, a in zip(unp, unal) if a is not None]
    unal = [a for a in unal if a is not None]
    return gp, kept, aligned, kept_u, unal, im, isd


def _legacy_soa(typer, locus, kept, aligned, kept_u, unal, im, isd, cfg):
    """The ExonObs object path, exactly as _type_locus assembled it before
    vectorisation."""
    levels, _, _, combined = typer._combined_exon_matrix(locus)
    lv_min, lv_max = int(levels.min()), int(levels.max())
    level_to_pos = {int(lv): j for j, lv in enumerate(levels)}
    pq = typer._compute_pair_quality(aligned, im, isd, cfg)
    reads_obs = []
    ok_a = pq[0]
    for i in np.nonzero(ok_a)[0]:
        r1, r2 = kept[i]
        ap = aligned[i]
        o1 = typer._alignment_to_obs(ap.chain1, r1, ap.chain2, r2,
                                     lv_min, lv_max, level_to_pos)
        o2 = typer._alignment_to_obs(ap.chain2, r2, ap.chain1, r1,
                                     lv_min, lv_max, level_to_pos)
        merged = typer._remove_double_positions(o1 + o2)
        if merged:
            reads_obs.append(merged)
    for r, al in zip(kept_u, unal):
        if (al.mapq >= cfg.minimum_mapping_quality
                and al.n_columns >= cfg.min_alignment_length_unpaired):
            o = typer._alignment_to_obs(al, r, None, None, lv_min, lv_max,
                                        level_to_pos)
            if o:
                reads_obs.append(o)
    return reads_obs, _ObsSoA(reads_obs), levels, lv_min, lv_max, pq


def test_vectorized_obs_matches_object_path(obs_world):
    gp, kept, aligned, kept_u, unal, im, isd = obs_world
    typer = HLATyper(gp)
    cfg = typer.cfg
    typer._setup_pair_ranges(aligned, unal)
    for locus in typer.loci:
        reads_obs, legacy, levels, lv_min, lv_max, pq = _legacy_soa(
            typer, locus, kept, aligned, kept_u, unal, im, isd, cfg)
        f1, l1, f2, l2, _, _ = typer._pair_ranges
        n = len(aligned)
        ov = (((f1[:n] <= lv_max) & (l1[:n] >= lv_min) & (f1[:n] >= 0))
              | ((f2[:n] <= lv_max) & (l2[:n] >= lv_min) & (f2[:n] >= 0)))
        vec = typer._collect_locus_obs(kept, aligned, kept_u, unal, ov, pq,
                                       levels, lv_min, lv_max, cfg)
        assert vec.n_obs == legacy.n_obs and vec.n_obs > 0
        assert vec.n_reads == legacy.n_reads
        np.testing.assert_array_equal(vec.read_idx, legacy.read_idx)
        np.testing.assert_array_equal(vec.pos, legacy.pos)
        np.testing.assert_array_equal(vec.q0, legacy.q0)
        np.testing.assert_array_equal(vec.run_novel, legacy.run_novel)
        np.testing.assert_array_equal(vec.rev, legacy.rev)
        np.testing.assert_array_equal(vec.ffr, legacy.ffr)
        np.testing.assert_array_equal(vec.mqp, legacy.mqp)
        np.testing.assert_array_equal(vec.w, legacy.w)
        np.testing.assert_array_equal(vec.wok, legacy.wok)
        # string-valued columns resolve through different intern tables —
        # compare the resolved values obs-by-obs
        flat = legacy.flat
        vg = [vec.genotypes[g] for g in vec.gid.tolist()]
        assert vg == [o.genotype for o in flat]
        vq = [vec.quals[q] for q in vec.qid.tolist()]
        assert vq == [o.qualities for o in flat]
        vn = [vec.names[i] for i in vec.name_id.tolist()]
        assert vn == [o.read_id for o in flat]
        mid = vec.mate_id.tolist()
        assert [vec.m_pname[m] for m in mid] == \
            [o.paired_read_id for o in flat]
        assert [vec.m_mapq[m] for m in mid] == [o.mapq for o in flat]
        assert [vec.m_dist[m] for m in mid] == \
            [o.pairs_strands_distance for o in flat]
        assert [vec.m_colsng[m] for m in mid] == \
            [o.alignment_cols_nongap for o in flat]
        assert [vec.m_wok_this[m] for m in mid] == \
            [o.this_weighted_ok for o in flat]
        assert [vec.m_wok_paired[m] for m in mid] == \
            [o.paired_weighted_ok for o in flat]
        # the read-kickout name lookup (filterFirst20) per read
        for ri in range(vec.n_reads):
            m0 = int(vec.read_mate0[ri])
            assert {vec.m_name[m0], vec.m_pname[m0]} == \
                {reads_obs[ri][0].read_id, reads_obs[ri][0].paired_read_id}
