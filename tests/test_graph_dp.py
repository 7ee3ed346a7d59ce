"""Graph-space DP tests — the testChainExtension property: an extension from
a seed anchor must reproduce an error-free read exactly
(HLA-LA.cpp:1733-1861), plus gap-jump and mismatch behaviour."""

import numpy as np
import pytest

from hla_la_tpu.graph.compile import compile_prg
from hla_la_tpu.graph.prg import prg_from_haplotypes
from hla_la_tpu.ops.graph_dp import extend_graph_dp
from hla_la_tpu.sim.graph_sim import simulate_prg_package


def _path_world(rng, n=400):
    sim = simulate_prg_package(rng, backbone_length=n, n_haplotypes=3)
    g = sim.prg
    c = compile_prg(g)
    seq_g, edges, nodes = g.simulate_random_paths(1, rng)[0]
    return g, c, seq_g, edges, nodes


def test_extension_positive_exact(rng):
    g, c, seq_g, edges, nodes = _path_world(rng)
    a, b = 50, 150
    read = seq_g[a:b].replace("_", "")
    assert len(read) > 50
    z0 = g.z_of_node(int(nodes[a]))
    ext = extend_graph_dp(c, read, start_seq=0, start_level=a, start_z=z0,
                          positive=True)
    assert ext is not None
    got = ext.seq_chars.replace("_", "")
    assert got == read
    assert ext.score == 2.0 * len(read)
    # graph chars at non-gap columns must match the path emissions
    k = 0
    for gc, lv in zip(ext.graph_chars, ext.levels):
        if gc != "_":
            assert gc == seq_g[lv]


def test_extension_negative_exact(rng):
    g, c, seq_g, edges, nodes = _path_world(rng)
    a, b = 60, 160
    read = seq_g[a:b].replace("_", "")
    zb = g.z_of_node(int(nodes[b]))
    ext = extend_graph_dp(c, read, start_seq=len(read), start_level=b,
                          start_z=zb, positive=False)
    assert ext is not None
    assert ext.seq_chars.replace("_", "") == read
    assert ext.score == 2.0 * len(read)


def test_extension_with_mismatch(rng):
    g, c, seq_g, edges, nodes = _path_world(rng)
    a, b = 50, 130
    read = list(seq_g[a:b].replace("_", ""))
    mid = len(read) // 2
    orig = read[mid]
    read[mid] = {"A": "C", "C": "G", "G": "T", "T": "A"}[orig]
    read = "".join(read)
    z0 = g.z_of_node(int(nodes[a]))
    ext = extend_graph_dp(c, read, 0, a, z0, True)
    assert ext is not None
    got = ext.seq_chars.replace("_", "")
    assert got == read
    # either a -5 mismatch or the graph offered the variant (panel SNP)
    assert ext.score >= 2.0 * len(read) - 7


def test_extension_crosses_gap_jump(rng):
    # haplotype panel with a long shared gap: extension must jump it
    haps = ["ACGTAC" + "_" * 30 + "GGTTAAC",
            "ACGTAC" + "_" * 30 + "GGTTAAC",
            "ATGTAC" + "_" * 30 + "GGTTATC"]
    g = prg_from_haplotypes(haps)
    c = compile_prg(g)
    assert len(c.jump_from) > 0
    read = "ACGTACGGTTAAC"
    first_nodes = g.nodes_at_level(0)
    ext = extend_graph_dp(c, read, 0, 0, 0, True)
    assert ext is not None
    assert ext.seq_chars.replace("_", "") == read
    assert ext.score == 2.0 * len(read)
    # the 30 gap levels appear as '_'/'_' columns with real levels
    gap_cols = [lv for gc, lv in zip(ext.graph_chars, ext.levels)
                if gc == "_"]
    assert len(gap_cols) == 30
