"""Native C++ fast paths must match the pure-Python fallbacks exactly
(seed chaining, candidate selection, projection+scoring).  These run the
same batch through both paths by toggling native.available()."""

import numpy as np
import pytest

import hla_la_tpu.native as native
from hla_la_tpu.models.aligner import ReadAligner
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(99)
    sim = simulate_prg_package(rng, backbone_length=3000, n_haplotypes=6)
    pkg = sim.write_package(str(tmp_path_factory.mktemp("np") / "pkg"))
    rs = ReadSimulator(rng, read_length=90, fragment_mean=260,
                       fragment_sd=25)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 6.0,
                                               name_prefix=f"h{h}")
    reads = [r.seq for p in pairs for r in (p.r1, p.r2)]
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    return pkg, reads, fq


def _with_native_disabled(fn):
    avail = native.available
    native.available = lambda: False
    try:
        return fn()
    finally:
        native.available = avail


def test_seed_candidates_parity(world):
    pkg, reads, _ = world
    seeder = ReadAligner(pkg).seeder
    got = seeder.candidates_batch(reads)
    want = _with_native_disabled(lambda: seeder.candidates_batch(reads))
    for a, b in zip(got, want):
        ka = [(c.seq_idx, c.reverse, c.ref_start, c.n_kmers, c.span)
              for c in a]
        kb = [(c.seq_idx, c.reverse, c.ref_start, c.n_kmers, c.span)
              for c in b]
        assert ka == kb


def test_alignment_parity(world):
    pkg, _, fq = world
    al = ReadAligner(pkg, graph_fallback=False)
    got = al.align_pairs(fq, 260, 25)
    al2 = ReadAligner(pkg, graph_fallback=False)
    want = _with_native_disabled(lambda: al2.align_pairs(fq, 260, 25))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        for ca, cb in ((a.chain1, b.chain1), (a.chain2, b.chain2)):
            assert np.array_equal(ca.levels, cb.levels)
            assert np.array_equal(ca.graph_c, cb.graph_c)
            assert np.array_equal(ca.seq_c, cb.seq_c)
            assert ca.reverse == cb.reverse
            assert abs(ca.log_likelihood - cb.log_likelihood) <= \
                1e-5 * max(1.0, abs(cb.log_likelihood))
        assert abs(a.mapq - b.mapq) < 1e-6


def test_graph_extend_parity():
    """Native hla_graph_extend must match the Python extend_graph_dp
    exactly — score, emitted columns, levels, and endpoint — on random
    extension problems in both directions, with errors and indels."""
    from hla_la_tpu.graph.compile import compile_prg
    from hla_la_tpu.ops.graph_dp import extend_graph_dp

    rng = np.random.default_rng(7)
    sim = simulate_prg_package(rng, backbone_length=500, n_haplotypes=4)
    c = compile_prg(sim.prg)
    seq_g, edges, nodes = sim.prg.simulate_random_paths(1, rng)[0]
    bases = "ACGT"

    def mutate(read):
        read = list(read)
        for _ in range(rng.integers(0, 3)):
            i = int(rng.integers(0, len(read)))
            op = rng.integers(0, 3)
            if op == 0:
                read[i] = bases[int(rng.integers(0, 4))]
            elif op == 1 and len(read) > 30:
                del read[i]
            else:
                read.insert(i, bases[int(rng.integers(0, 4))])
        return "".join(read)

    n_checked = 0
    for _ in range(25):
        a = int(rng.integers(0, 350))
        b = a + int(rng.integers(60, 140))
        read = mutate(seq_g[a:b].replace("_", ""))
        if len(read) < 40:
            continue
        pos = bool(rng.integers(0, 2))
        if pos:
            args = (read, 0, a, sim.prg.z_of_node(int(nodes[a])), True)
        else:
            args = (read, len(read), b,
                    sim.prg.z_of_node(int(nodes[b])), False)
        got = extend_graph_dp(c, *args)
        want = _with_native_disabled(lambda: extend_graph_dp(c, *args))
        if want is None:
            assert got is None
            continue
        assert got is not None
        assert got.score == pytest.approx(want.score, abs=1e-9)
        assert got.graph_chars == want.graph_chars
        assert got.seq_chars == want.seq_chars
        assert got.levels == want.levels
        assert (got.end_level, got.end_seq, got.end_z) == \
            (want.end_level, want.end_seq, want.end_z)
        n_checked += 1
    assert n_checked >= 15


def test_select_pair_edge_cases(world):
    """Native selection must match Python for degenerate inputs: single
    chains, invalid strands, disjoint haplotypes (no shared anchors)."""
    import hla_la_tpu.models.aligner as A
    from hla_la_tpu.models.aligner import ReadAligner, _normal_logpdf

    pkg, _, fq = world
    base = ReadAligner(pkg, graph_fallback=False)

    # run a real batch but stress-test by truncating candidate lists to one
    # chain per mate and flipping strand validity
    al = ReadAligner(pkg, graph_fallback=False)
    al.seeder.max_candidates = 1
    got = al.align_pairs(fq, 260, 25)
    al2 = ReadAligner(pkg, graph_fallback=False)
    al2.seeder.max_candidates = 1
    al2._select_pairs_native = lambda *a, **k: None
    want = al2.align_pairs(fq, 260, 25)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert abs(a.mapq - b.mapq) < 1e-9
        assert abs(a.chain1.mapq - b.chain1.mapq) < 1e-9
        assert np.array_equal(a.chain1.levels, b.chain1.levels)


def test_repr_double_parity():
    """hla_repr_double must be byte-identical to CPython's float repr —
    the PP-pairs dump (hla_format_pairs) relies on it for snapshot-level
    byte parity.  Sweep the layout boundaries (fixed<->scientific at
    exp10 -4/16), integral floats, subnormals, and a large random mix."""
    import math
    import struct

    adversarial = [
        0.0, -0.0, 1.0, -1.0, 0.5, 1.5, 123.45, -123.45,
        1e-4, 9.999e-5, 1e-5, 1.0000000000000002e-4,
        1e15, 1e16, 1.5e16, 9999999999999998.0, 1e17,
        15000.0, 0.0015, 1e300, 1e-300, 5e-324, 2.2250738585072014e-308,
        1.7976931348623157e308, 1 / 3, 2 / 3, math.pi, math.e,
        0.1, 0.2, 0.30000000000000004, -40.123456789,
        float("inf"), float("-inf"), float("nan"),
    ]
    for v in adversarial:
        assert native.repr_double(v) == repr(v), v

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(-40, 20, 20000),
        rng.normal(0, 1e-6, 5000),
        np.exp(rng.uniform(-700, 700, 20000)) *
        np.where(rng.random(20000) < 0.5, -1, 1),
        struct.unpack("<10000d", rng.bytes(80000)),
    ])
    for v in vals.tolist():
        if v != v:          # random-bits NaNs all repr as 'nan'
            assert native.repr_double(v) == "nan"
        else:
            assert native.repr_double(v) == repr(v), v


def test_format_pairs_parity():
    """Native bulk dump body must be byte-identical to the python
    formatting loop in HLATyper (dump contract HLATyper.cpp:2382-2404)."""
    rng = np.random.default_rng(11)
    C, n = 7, 400
    ids = [f"A*{i:02d}:01;A*{i:02d}:02N".encode() for i in range(C)]
    a = rng.integers(0, C, n).astype(np.int32)
    b = rng.integers(0, C, n).astype(np.int32)
    P = np.exp(rng.normal(-200, 100, n))
    LL = rng.normal(-1e4, 1e3, n)
    MM = rng.integers(0, 50, n) / 2.0
    got = native.format_pairs(a, b, P, LL, MM, ids)
    want = "".join(
        f"{ids[x].decode()}/{ids[y].decode()}\t{p}\t{v}\t{m}\n"
        for x, y, p, v, m in zip(a.tolist(), b.tolist(), P.tolist(),
                                 LL.tolist(), MM.tolist())).encode()
    assert got == want


def test_pair_ll_f32_bitexact_vs_f64_path():
    """hla_pair_ll_f32 (cvt-on-load) must be BIT-identical to the f64
    kernel run on the up-converted matrix — same accumulation structure,
    exact f32->f64 conversion (HLATyper.cpp:2280-2364 reduction)."""
    rng = np.random.default_rng(23)
    for C, R in ((5, 37), (64, 1000), (130, 2048)):
        L32 = rng.normal(-40, 8, (C, R)).astype(np.float32)
        got = native.pair_ll(L32)
        want = native.pair_ll(L32.astype(np.float64))
        assert np.array_equal(got, want), (C, R)


def test_kmer_count_build_parity():
    """Native hla_kmer_count_build == the numpy sort+run-length path of
    KmerCountIndex.build (sorted unique canonical codes + counts),
    including N/lowercase handling and separator-crossing k-mers."""
    if not native.available():
        pytest.skip("native lib unavailable")
    from hla_la_tpu.mapping.kmer_index import encode_kmers
    from hla_la_tpu.models.typer import _revcomp_codes
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGTacgtN"), size=int(n),
                               p=[.118] * 8 + [.056]))
            for n in rng.integers(20, 160, size=400)]
    k = 31
    cat = np.frombuffer(("\x00".join(seqs)).encode(), dtype=np.uint8)
    res = native.kmer_count_build(cat, k)
    assert res is not None
    codes, valid = encode_kmers(cat, k)
    canon = np.minimum(codes, _revcomp_codes(codes, k))[valid]
    want_codes, want_counts = np.unique(canon, return_counts=True)
    assert np.array_equal(res[0], want_codes)
    assert np.array_equal(res[1], want_counts.astype(np.int64))
    # empty / all-invalid inputs
    for edge in (np.zeros(0, np.uint8),
                 np.frombuffer(b"N" * 64, dtype=np.uint8)):
        r = native.kmer_count_build(edge, k)
        assert len(r[0]) == 0 and len(r[1]) == 0


def test_build_read_tensors_native_bitexact():
    """hla_build_read_tensors == the numpy scatter path of
    typer._build_read_tensors, bit for bit, in both layouts."""
    if not native.available():
        pytest.skip("native lib unavailable")
    from hla_la_tpu.models.typer import HLATyper, _ObsSoA  # noqa: F401
    import hla_la_tpu.models.typer as T

    rng = np.random.default_rng(17)
    # synthetic SoA with multi-base genotypes, gaps, and odd quality bytes
    genos = ["A", "C", "G", "T", "_", "AC", "GATT", "N", "TTG"]
    n_obs, R, J = 5000, 64, 300

    class FakeSoA:
        pass

    soa = FakeSoA()
    soa.n_obs = n_obs
    soa.n_reads = R
    soa.genotypes = genos
    soa.gid = rng.integers(0, len(genos), n_obs)
    soa.read_idx = rng.integers(0, R, n_obs)
    # (r, j) unique per obs: draw unique flat cells
    cells = rng.choice(R * J, size=n_obs, replace=False)
    soa.read_idx = cells // J
    soa.pos = cells % J
    soa.q0 = rng.integers(33, 127, n_obs)

    typer = HLATyper.__new__(HLATyper)
    for transposed in (False, True):
        shape = (J * 6, R) if transposed else (R, J, 6)
        kept = np.ones(n_obs, dtype=bool)
        got = T.HLATyper._build_read_tensors(
            typer, None, J, None, set(), {}, False, 0.001,
            soa=soa, kept_mask=kept, transposed=transposed)
        # python reference: force the fallback path
        import hla_la_tpu.native as nat
        orig = nat.build_read_tensors
        nat.build_read_tensors = lambda *a, **k: False
        try:
            want = T.HLATyper._build_read_tensors(
                typer, None, J, None, set(), {}, False, 0.001,
                soa=soa, kept_mask=kept, transposed=transposed)
        finally:
            nat.build_read_tensors = orig
        assert np.array_equal(got[0], want[0]), "contrib differs"
        assert np.array_equal(got[1], want[1]), "mismatch differs"
        assert got[2] == want[2]


def test_chain_record_native_bitexact():
    """hla_chain_record == the python _chain_records body (identical record
    arrays AND identical intern-table evolution), across chains with
    deletions, trailing insertions, novel-gap runs, and a mapq vector."""
    if not native.available():
        pytest.skip("native lib unavailable")
    from hla_la_tpu.models.alignment import GraphAlignment
    from hla_la_tpu.models.typer import HLATyper

    rng = np.random.default_rng(23)

    def mk_chain(n):
        seq = rng.choice(np.frombuffer(b"ACGT_", np.uint8), size=n)
        gph = rng.choice(np.frombuffer(b"ACGT_", np.uint8), size=n)
        lv = np.arange(n, dtype=np.int64)
        # sprinkle insertion columns (level -1 runs)
        ins = rng.random(n) < 0.15
        ins[0] = False
        lv[ins] = -1
        lv[~ins] = np.arange(int((~ins).sum()))
        qual = rng.integers(33, 74, n).astype(np.uint8)
        al = GraphAlignment.__new__(GraphAlignment)
        al.__dict__ = dict(levels=lv, graph_c=gph, seq_c=seq,
                           seq_qual=qual, reverse=False, seq_idx=0,
                           mapq=1.0, from_first_read=True,
                           log_likelihood=0.0,
                           mapq_per_pos=(rng.random(n)
                                         if rng.random() < 0.5 else None))
        return al

    chains = [mk_chain(int(rng.integers(5, 120))) for _ in range(60)]

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
