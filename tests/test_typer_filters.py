"""Unit tests for the typing engine's filter layers (HLATyper.cpp:1403-1880):
read gates (strand/insert/mapQ), filterFirst20, high-coverage allele filter,
long-read strand filter, removeDoublePositions."""

import numpy as np
import pytest

from hla_la_tpu.models.typer import ExonObs, HLATyper
from hla_la_tpu.utils.config import TyperConfig


def mk_obs(pos, geno, read_id="r1", wok=1.0, mapq_pos=1.0, reverse=False,
           first=True, qual=b"I", novel=0):
    return ExonObs(graph_level=pos, position_in_exon=pos, genotype=geno,
                   qualities=qual if geno != "_" else b"",
                   mapq=1.0, mapq_position=mapq_pos, read_id=read_id,
                   paired_read_id=read_id + "p", this_weighted_ok=wok,
                   paired_weighted_ok=wok, pairs_strands_distance=100.0,
                   alignment_cols_nongap=100, running_novel_gap=novel,
                   reverse=reverse, from_first_read=first)


def _typer():
    t = HLATyper.__new__(HLATyper)
    t.cfg = TyperConfig()
    return t


def test_filter_first20_kicks_rare_allele():
    t = _typer()
    cfg = TyperConfig()
    # 25 reads support 'A' at position 5, one read sees 'G' (below top-20)
    reads_obs = [[mk_obs(5, "A", read_id=f"r{i}", wok=0.99)]
                 for i in range(25)]
    reads_obs.append([mk_obs(5, "G", read_id="weird", wok=0.5)])
    ignore_reads: set = set()
    ignore_alleles: dict = {}
    t._filter_first20(reads_obs, ignore_reads, ignore_alleles, cfg)
    assert "G" in ignore_alleles.get(5, set())
    assert "A" not in ignore_alleles.get(5, set())


def test_filter_first20_needs_min_coverage():
    t = _typer()
    cfg = TyperConfig()
    reads_obs = [[mk_obs(5, "A", read_id=f"r{i}")] for i in range(5)]
    reads_obs.append([mk_obs(5, "G", read_id="weird")])
    ignore_reads: set = set()
    ignore_alleles: dict = {}
    t._filter_first20(reads_obs, ignore_reads, ignore_alleles, cfg)
    # below filterFirst20N total coverage: no filtering
    assert 5 not in ignore_alleles


def test_high_coverage_allele_filter():
    t = _typer()
    cfg = TyperConfig(high_coverage_filter_alleles=True,
                      high_coverage_min_coverage=10,
                      high_coverage_min_allele_freq=0.2)
    reads_obs = ([[mk_obs(3, "C", read_id=f"a{i}")] for i in range(9)]
                 + [[mk_obs(3, "T", read_id="b0")]])
    ignore_alleles: dict = {}
    counts_post, strand_freqs, read1_freqs = t._allele_filters(
        reads_obs, set(), ignore_alleles, cfg, long_reads=False)
    assert "T" in ignore_alleles.get(3, set())      # 10% < 20%
    assert counts_post[3]["C"] == 9
    assert "T" not in counts_post.get(3, {})


def test_long_read_strand_filter():
    t = _typer()
    cfg = TyperConfig(long_reads_filter_strand=True,
                      long_reads_filter_strand_min_allele_coverage=10,
                      long_reads_filter_strand_min_strand_freq=0.2)
    # allele 'A': 12 fwd, 0 rev -> strand-biased
    reads_obs = [[mk_obs(7, "A", read_id=f"f{i}", reverse=False)]
                 for i in range(12)]
    ignore_alleles: dict = {}
    t._allele_filters(reads_obs, set(), ignore_alleles, cfg, long_reads=True)
    assert "A" in ignore_alleles.get(7, set())


def test_strand_freq_bookkeeping():
    t = _typer()
    cfg = TyperConfig()
    reads_obs = ([[mk_obs(2, "A", read_id=f"f{i}", reverse=False)]
                  for i in range(3)]
                 + [[mk_obs(2, "A", read_id=f"r{i}", reverse=True)]
                    for i in range(1)])
    _, strand_freqs, read1_freqs = t._allele_filters(
        reads_obs, set(), {}, cfg, long_reads=False)
    assert strand_freqs[2]["A"] == pytest.approx(0.25)
    assert read1_freqs[2]["A"] == pytest.approx(1.0)


def test_remove_double_positions_keeps_best_quality():
    a = mk_obs(4, "A", qual=b"5")
    b = mk_obs(4, "C", qual=b"I")
    out = HLATyper._remove_double_positions([a, b])
    assert len(out) == 1
    assert out[0].genotype == "C"
    # deletions (no qualities) lose against any base call
    d = mk_obs(6, "_")
    e = mk_obs(6, "T", qual=b"#")
    out = HLATyper._remove_double_positions([d, e])
    assert out[0].genotype == "T"
