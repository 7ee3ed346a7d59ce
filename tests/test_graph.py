"""Graph core tests: construction, text round-trip, structure checks,
gap-path index, compilation (build plan step 1, SURVEY.md §7)."""

import numpy as np
import pytest

from hla_la_tpu.graph.prg import PRG, prg_from_haplotypes
from hla_la_tpu.graph.compile import compile_prg


HAPS = [
    "ACGT_A",
    "ACCTTA",
    "AC__TA",
]
COLS = [f"c{i}" for i in range(6)]


def build():
    return prg_from_haplotypes(HAPS, COLS)


def test_build_from_haplotypes_structure():
    g = build()
    g.check_structure()
    assert g.n_levels == 7
    # level 0 and 1 have a single shared node; level 3 splits
    assert len(g.nodes_at_level(0)) == 1
    assert len(g.nodes_at_level(1)) == 1


def test_each_haplotype_is_a_path():
    g = build()
    for h in HAPS:
        assert g.path_emits(h)
    assert not g.path_emits("AAAAAA")
    assert not g.path_emits("ACGTAA")  # mixes columns across haplotypes wrongly?
    # mosaic paths are allowed when nodes merge; just check a clearly absent one
    assert not g.path_emits("TTTTTT")


def test_text_roundtrip():
    g = build()
    text = g.to_text()
    g2 = PRG.from_text(text)
    g2.check_structure()
    assert g2.n_levels == g.n_levels
    assert g2.n_nodes == g.n_nodes
    assert g2.n_edges == g.n_edges
    for h in HAPS:
        assert g2.path_emits(h)
    # emissions multiset per level must match
    for lv in range(g.n_levels - 1):
        def ems(gr):
            out = []
            for n in gr.nodes_at_level(lv):
                for e in gr.out_edge_ids(n):
                    out.append(gr.edge_emission[e])
            return sorted(out)
        assert ems(g) == ems(g2)


def test_gap_edge_paths():
    g = build()
    paths = g.compute_gap_edge_paths()
    # haplotype 3 has gap run at columns 2-3 (levels 2->4): one 2-edge path;
    # haplotype 1 has gap at column 4 (levels 4->5): one 1-edge path
    lens = sorted(len(p[2]) for p in paths)
    assert lens == [1, 2]
    for first, last, edges in paths:
        assert g.node_level[last] - g.node_level[first] == len(edges)
        for e in edges:
            assert g.edge_emission[e] == ord("_")


def test_compiled_prg_roundtrip(tmp_path):
    g = build()
    c = compile_prg(g)
    assert c.n_levels == g.n_levels
    assert c.max_z >= 2
    p = tmp_path / "ser.npz"
    c.save(str(p))
    c2 = type(c).load(str(p))
    np.testing.assert_array_equal(c.node_level, c2.node_level)
    np.testing.assert_array_equal(c.jump_len, c2.jump_len)


def test_window_tables():
    g = build()
    c = compile_prg(g)
    w = c.window_tables(0, c.n_levels - 1, z_pad=4, deg_pad=4)
    # level 0 has one node with 1 successor (all haps share 'A')
    assert w["succ_z"][0, 0, 0] >= 0
    assert chr(w["succ_em"][0, 0, 0]) == "A"
    # z counts match level sizes
    for lv in range(c.n_levels):
        assert w["z_count"][lv] == len(
            range(c.level_offsets[lv], c.level_offsets[lv + 1]))


def test_simulate_random_paths(rng):
    g = build()
    for seq, edges, nodes in g.simulate_random_paths(10, rng):
        assert len(seq) == g.n_levels - 1
        assert g.path_emits(seq)
        for i, e in enumerate(edges):
            assert g.edge_from[e] == nodes[i]
            assert g.edge_to[e] == nodes[i + 1]


def test_level_index_sparse_matches_dense(rng):
    """The big-graph searchsorted path (+ batch warm) must agree with the
    materialised dict path."""
    import numpy as np

    from hla_la_tpu.graph.package import LevelIndex

    translations = {}
    for sid in range(5):
        lv = np.sort(rng.choice(np.arange(500), size=200, replace=False))
        translations[sid] = lv.astype(np.int64)
    dense = LevelIndex(translations)
    sparse = LevelIndex(translations, materialize_limit=0)
    queries = list(rng.integers(-5, 510, 300))
    sparse.warm(queries[:150])     # half via warm, half via get misses
    for q in queries:
        assert dense.get(int(q)) == sparse.get(int(q)), q
