"""Graph-space fallback: a recombinant read (crossover between two panel
haplotypes) aligns poorly to every single haplotype but perfectly through the
graph — the one capability linear-projection alignment alone lacks."""

import numpy as np
import pytest

from hla_la_tpu.graph.compile import compile_prg
from hla_la_tpu.io.fastq import FastqRead
from hla_la_tpu.models.aligner import ReadAligner
from hla_la_tpu.models.graph_fallback import walk_haplotype
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import revcomp


@pytest.fixture(scope="module")
def fb_world(tmp_path_factory):
    rng = np.random.default_rng(777)
    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=4,
                               snp_rate=0.05)  # dense SNPs: recombinants hurt
    pkg = sim.write_package(str(tmp_path_factory.mktemp("fb") / "pkg"))
    return rng, sim, pkg


def test_walk_haplotype(fb_world):
    rng, sim, pkg = fb_world
    c = pkg.compiled()
    for hi in range(len(sim.haplotypes)):
        seq, levels = sim.linearized(hi)
        path = walk_haplotype(c, seq, levels)
        assert path is not None
        assert len(path) == c.n_levels
        # node at each level must actually be at that level
        lv = c.node_level[path]
        np.testing.assert_array_equal(lv, np.arange(c.n_levels))


def test_recombinant_read_realigned(fb_world):
    rng, sim, pkg = fb_world
    s1, l1 = sim.linearized(1)
    s2, l2 = sim.linearized(2)
    # crossover read: left half from hap1, right half from hap2, joined at a
    # shared graph level
    cross_level = 700
    i1 = int(np.searchsorted(l1, cross_level))
    i2 = int(np.searchsorted(l2, cross_level))
    read = s1[i1 - 60:i1] + s2[i2:i2 + 60]
    assert len(read) == 120
    fq = FastqRead("recomb", read, "I" * len(read))
    mate = FastqRead("recomb", revcomp(s1[i1 + 150:i1 + 250]), "I" * 100)

    al_fb = ReadAligner(pkg, graph_fallback=True)
    out = al_fb.align_pairs([(fq, mate)], insert_mean=150, insert_sd=100)
    assert out
    chain = out[0].chain1
    n_bases = int((chain.seq_c != ord("_")).sum())

    al_nofb = ReadAligner(pkg, graph_fallback=False)
    out0 = al_nofb.align_pairs([(fq, mate)], insert_mean=150, insert_sd=100)
    chain0 = out0[0].chain1

    # with fallback the read must align at least as well, and (with dense
    # SNPs) strictly better than the best single-haplotype alignment
    assert chain.log_likelihood >= chain0.log_likelihood
    assert chain.log_likelihood / n_bases > -0.25, \
        (chain.log_likelihood, chain0.log_likelihood)
