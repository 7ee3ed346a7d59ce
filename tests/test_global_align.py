"""Chain-enriched global alignment (globalAlignment.pl equivalent)."""

import numpy as np
import pytest

from hla_la_tpu.mapping.global_align import (global_alignment,
                                             write_global_alignment)
from hla_la_tpu.sim.read_sim import revcomp


@pytest.fixture(scope="module")
def ref(rng_module=None):
    rng = np.random.default_rng(3)
    return "".join(rng.choice(list("ACGT"), 4000)), rng


def test_snp_mutated_query(ref):
    reference, rng = ref
    q = list(reference[500:3500])
    n_mut = 0
    for i in range(0, len(q), 97):
        q[i] = "ACGT"[("ACGT".index(q[i]) + 1) % 4]
        n_mut += 1
    ar, aq, mism, (lo, hi), strand = global_alignment("".join(q), reference)
    assert strand == "+"
    assert abs(mism - n_mut) <= 2
    # reconstruction invariants (also asserted inside)
    assert aq.replace("-", "") == "".join(q)
    assert ar.replace("-", "") == reference
    # the flanks the query does not cover are reference-only gaps
    assert aq.count("-") >= 500 + 500 - 20


def test_long_deletion(ref):
    reference, rng = ref
    q = reference[300:1500] + reference[1700:3600]   # 200bp deletion
    ar, aq, mism, span, strand = global_alignment(q, reference)
    assert mism <= 10
    # one ~200bp query-gap run must exist (the deletion), beyond the flanks
    import re
    runs = sorted((len(m.group()) for m in re.finditer(r"-+", aq)),
                  reverse=True)
    assert any(180 <= r <= 220 for r in runs), runs[:5]


def test_long_insertion(ref):
    reference, rng = ref
    ins = "".join(rng.choice(list("ACGT"), 150))
    q = reference[300:1800] + ins + reference[1800:3600]
    ar, aq, mism, span, strand = global_alignment(q, reference)
    # the novel 150bp must cost at most 150 of gap+mismatch, and the
    # flanking sequence must align cleanly
    assert mism + ar.count("-") <= 170
    assert ar.count("-") + aq.count("-") - (len(reference) - len(q)) >= 0


def test_reverse_strand(ref):
    reference, rng = ref
    ar, aq, mism, span, strand = global_alignment(
        revcomp(reference[1000:2000]), reference)
    assert strand == "-"
    assert mism <= 2


def test_output_contract(ref, tmp_path):
    """3-line output: 'n_mismatches refFirst-refLast strand0-queryLen',
    aligned reference, aligned query (globalAlignment.pl:487-505)."""
    reference, rng = ref
    q = reference[100:900]
    path = str(tmp_path / "ga.txt")
    mism, strand = write_global_alignment(path, q, reference)
    lines = open(path).read().splitlines()
    assert len(lines) == 3
    head = lines[0].split()
    assert head[0] == str(mism)
    assert "-" in head[1]
    assert lines[1].replace("-", "") == reference
    assert lines[2].replace("-", "") == q
    assert len(lines[1]) == len(lines[2])


def test_no_seed_fallback():
    """Dissimilar sequences still produce a legal global alignment."""
    a = "A" * 60
    b = "C" * 80
    ar, aq, mism, span, strand = global_alignment(a, b)
    assert aq.replace("-", "") == a
    assert ar.replace("-", "") == b
