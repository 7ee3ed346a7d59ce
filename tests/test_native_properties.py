"""Randomized differential PROPERTY tests for the seeding/selection native
entries (VERDICT r4 next #8): `hla_seed_chain` (k-mer seeding + diagonal
chaining), `hla_select_pairs` (combination-model pair selection + mapQs)
and `hla_chain_record` (per-chain typing records + intern evolution) —
random WORLDS per trial (varying graph size, panel depth, SNP rate, read
length/error, adversarial reads), python-vs-native equality on every
output field.  Extends the fixed-world locks in test_native_parity.py the
way r4's test_from_text_randomized_differential did for the parser stack.
Reference semantics: processBAM.cpp protoSeeds/alignOneReadPair,
HLATyper.cpp:3192-3566 column walk."""

import numpy as np
import pytest

import hla_la_tpu.native as native
from hla_la_tpu.models.aligner import ReadAligner
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _with_native_disabled(fn):
    avail = native.available
    native.available = lambda: False
    try:
        return fn()
    finally:
        native.available = avail


def _random_world(rng, tmp_path, tag):
    bb = int(rng.integers(600, 3500))
    n_h = int(rng.integers(2, 7))
    snp = float(rng.uniform(0.003, 0.03))
    sim = simulate_prg_package(rng, backbone_length=bb, n_haplotypes=n_h,
                               snp_rate=snp)
    pkg = sim.write_package(str(tmp_path / f"pkg_{tag}"))
    rl = int(rng.integers(60, 140))
    frag = rl * 2 + int(rng.integers(20, 160))
    rs = ReadSimulator(rng, read_length=rl, fragment_mean=frag,
                       fragment_sd=int(rng.integers(10, 40)),
                       with_error=bool(rng.integers(0, 2)))
    pairs = []
    for h in range(1, min(n_h, 3) + 1):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(
            seq, levels, float(rng.uniform(1.5, 5.0)), name_prefix=f"h{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    # adversarial extras: junk alphabet, homopolymers, N bases, short reads
    from hla_la_tpu.io.fastq import FastqRead
    junk = [
        FastqRead("junk_rand", "".join(rng.choice(list("ACGT"), rl)),
                  "I" * rl),
        FastqRead("junk_homo", "A" * rl, "I" * rl),
        FastqRead("junk_n", ("ACGTN" * rl)[:rl], "I" * rl),
        FastqRead("junk_short", "ACGTACGTAC", "I" * 10),
    ]
    for j in range(0, len(junk) - 1, 2):
        fq.append((junk[j], junk[j + 1]))
    return pkg, fq, frag


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_seed_chain_and_selection_randomized(tmp_path, seed):
    """align_pairs (seed_chain -> NW -> projection -> select_pairs) must be
    identical with and without the native lib on random worlds, chain by
    chain and field by field."""
    rng = np.random.default_rng(seed)
    pkg, fq, frag = _random_world(rng, tmp_path, seed)
    ins_sd = 30

    al = ReadAligner(pkg, graph_fallback=False)
    got = al.align_pairs(fq, frag, ins_sd)
    al2 = ReadAligner(pkg, graph_fallback=False)
    want = _with_native_disabled(lambda: al2.align_pairs(fq, frag, ins_sd))

    # seeding candidates first (isolates hla_seed_chain from selection)
    reads = [r.seq for p in fq for r in p]
    cand_n = al.seeder.candidates_batch(reads)
    cand_p = _with_native_disabled(
        lambda: al2.seeder.candidates_batch(reads))
    assert len(cand_n) == len(cand_p)
    for a, b in zip(cand_n, cand_p):
        ka = [(c.seq_idx, c.reverse, c.ref_start, c.n_kmers, c.span)
              for c in a]
        kb = [(c.seq_idx, c.reverse, c.ref_start, c.n_kmers, c.span)
              for c in b]
        assert ka == kb

    # full per-pair equality (exercises hla_select_pairs end-to-end)
    assert len(got) == len(want)
    assert [a.read_id for a in got] == [b.read_id for b in want]
    for a, b in zip(got, want):
        assert abs(a.mapq - b.mapq) < 1e-6, \
            (a.read_id, a.mapq, b.mapq)
        for ca, cb in ((a.chain1, b.chain1), (a.chain2, b.chain2)):
            assert np.array_equal(ca.levels, cb.levels)
            assert np.array_equal(ca.graph_c, cb.graph_c)
            assert np.array_equal(ca.seq_c, cb.seq_c)
            assert np.array_equal(ca.seq_qual, cb.seq_qual)
            assert ca.reverse == cb.reverse
            assert ca.seq_idx == cb.seq_idx
            assert ca.from_first_read == cb.from_first_read
            # float scores: the native kernels sum in a different order
            # (AVX lanes) — same tolerance discipline as
            # test_native_parity.test_alignment_parity
            assert abs(ca.mapq - cb.mapq) < 1e-6
            assert abs(ca.log_likelihood - cb.log_likelihood) <= \
                1e-5 * max(1.0, abs(cb.log_likelihood))
            if ca.mapq_per_pos is None or cb.mapq_per_pos is None:
                assert (ca.mapq_per_pos is None) == (cb.mapq_per_pos is None)
            else:
                assert np.allclose(ca.mapq_per_pos, cb.mapq_per_pos,
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("seed", [17, 29, 41])
def test_chain_record_randomized(seed):
    """hla_chain_record vs the python _chain_records body on randomized
    chain populations: record arrays AND intern-table evolution identical.
    Distributions vary per seed: gap/insertion densities, qual alphabets
    incl. edge bytes, all-insertion tails, mapq vectors present/absent."""
    from hla_la_tpu.models.alignment import GraphAlignment
    from hla_la_tpu.models.typer import HLATyper

    rng = np.random.default_rng(seed)
    p_ins = float(rng.uniform(0.02, 0.45))
    p_gap = float(rng.uniform(0.05, 0.4))
    qual_lo, qual_hi = (0, 255) if seed % 2 else (33, 74)

    def mk_chain(n):
        bases = np.frombuffer(b"ACGT", np.uint8)
        seq = rng.choice(bases, size=n)
        gph = rng.choice(bases, size=n)
        seq[rng.random(n) < p_gap] = ord("_")
        gph[rng.random(n) < p_gap] = ord("_")
        lv = np.empty(n, dtype=np.int64)
        ins = rng.random(n) < p_ins
        ins[0] = False
        if rng.random() < 0.3 and n > 6:        # long insertion tail
            ins[-int(rng.integers(2, max(3, min(n // 2, 8)))):] = True
        lv[ins] = -1
        lv[~ins] = np.arange(int((~ins).sum()))
        qual = rng.integers(qual_lo, qual_hi + 1, n).astype(np.uint8)
        al = GraphAlignment.__new__(GraphAlignment)
        al.__dict__ = dict(levels=lv, graph_c=gph, seq_c=seq,
                           seq_qual=qual, reverse=bool(rng.integers(2)),
                           seq_idx=0, mapq=1.0, from_first_read=True,
                           log_likelihood=0.0,
                           mapq_per_pos=(rng.random(n)
                                         if rng.random() < 0.5 else None))
        return al

    chains = [mk_chain(int(rng.integers(2, 160))) for _ in range(50)]

    def run(disable_native):
        t = HLATyper.__new__(HLATyper)
        t._geno_ids, t._geno_list = {}, []
        t._qual_ids, t._qual_list = {}, []
        t._lut_g = np.full(256, -1, dtype=np.int64)
        t._lut_q = np.full(256, -1, dtype=np.int64)
        t._qid_empty = -1
        t._intern_token = object()
        out = []
        if disable_native:
            orig = native.chain_record
            native.chain_record = lambda *a, **k: None
        try:
            for al in chains:
                al._records = None
                out.append(dict(HLATyper._chain_records(t, al)))
                al._records = None
        finally:
            if disable_native:
                native.chain_record = orig
        return out, t._geno_list, t._qual_list

    got, g_gl, g_ql = run(False)
    want, w_gl, w_ql = run(True)
    assert g_gl == w_gl and g_ql == w_ql, "intern-table evolution differs"
    for a, b in zip(got, want):
        for k in ("levels", "worst_q", "gid", "qid", "q0", "mapq_pos",
                  "run_novel"):
            assert np.array_equal(a[k], b[k]), k
        assert a["cols_nongap"] == b["cols_nongap"]
