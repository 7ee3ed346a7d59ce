"""Graph alignment records and linear->graph projection.

`GraphAlignment` is the dense equivalent of the reference's verboseSeedChain
(mapper/reads/verboseSeedChain.h:22-120): parallel arrays of graph levels
(-1 = insertion relative to the graph), graph characters ('_' = gap) and
sequence characters ('_' = gap), plus orientation and mapQ fields.

`project_linear_alignment` turns a banded-NW linear alignment against a
linearized haplotype into graph coordinates using the haplotype's
level-translation array — the role of transformBAMreadToInternalAlignment +
PRGContigAlignment2Seed (processBAM.cpp:4794, 2491): haplotype level-skips
become intrinsic graph gap columns ('_'/'_' with real levels, zero cost).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops.banded_nw import CIGAR_D, CIGAR_I, CIGAR_M
from ..utils.phred import phred_to_p_correct_table

GAP = ord("_")


@dataclass
class GraphAlignment:
    levels: np.ndarray       # [C] int64 graph level per column (-1 = insertion)
    graph_c: np.ndarray      # [C] uint8 graph char ('_' = gap)
    seq_c: np.ndarray        # [C] uint8 read char in alignment orientation
    seq_qual: np.ndarray     # [C] uint8 quality byte (0 where seq gap)
    reverse: bool
    seq_idx: int = -1        # underlying haplotype (prg_id); -1 unknown
    mapq: float = 1.0
    mapq_per_pos: np.ndarray | None = None  # [C] float posterior per column
    from_first_read: bool = True
    log_likelihood: float = 0.0

    @property
    def n_columns(self) -> int:
        return len(self.levels)

    _first_level: int | None = None
    _last_level: int | None = None

    def first_level(self) -> int:
        if self._first_level is None:
            m = self.levels[self.levels >= 0]
            self._first_level = int(m[0]) if len(m) else -1
            self._last_level = int(m[-1]) if len(m) else -1
        return self._first_level

    def last_level(self) -> int:
        if self._last_level is None:
            self.first_level()
        return self._last_level

    def graph_str(self) -> str:
        return bytes(self.graph_c).decode()

    def seq_str(self) -> str:
        return bytes(self.seq_c).decode()

    def check_concordance(self, oriented_read: str) -> None:
        """verboseSeedChain::checkChainConcordanceWithSequence equivalent."""
        s = bytes(self.seq_c[self.seq_c != GAP]).decode()
        assert s == oriented_read[:len(s)] or s in oriented_read, \
            f"alignment sequence {s!r} not concordant with read"

    def aligned_levels_per_base(self, read_length: int) -> np.ndarray:
        """Graph level for each base of the read in *sequencing* orientation
        (-1 where unaligned / inserted) — the TrueReadLevels contract."""
        out = np.full(read_length, -1, dtype=np.int64)
        i = 0
        for c in range(self.n_columns):
            if self.seq_c[c] != GAP:
                if i < read_length:
                    idx = read_length - 1 - i if self.reverse else i
                    out[idx] = self.levels[c]
                i += 1
        return out


def project_linear_alignment(ops, oriented_read: str, oriented_qual: str,
                             hap_seq: str, hap_levels: np.ndarray,
                             window_start: int, reverse: bool,
                             seq_idx: int) -> GraphAlignment | None:
    """ops: banded-NW backtrace [(op, read_pos, window_ref_pos)] (list or
    [n, 3] int array); absolute haplotype position = window_start +
    window_ref_pos.  Fully vectorised: intrinsic graph-gap columns ('_'/'_'
    with real levels) are interleaved wherever the haplotype skips levels."""
    ops_arr = np.asarray(ops, dtype=np.int64)
    if ops_arr.size == 0:
        return None
    op = ops_arr[:, 0]
    read_pos = ops_arr[:, 1]
    ref_pos = ops_arr[:, 2]
    rb = np.frombuffer(oriented_read.encode(), dtype=np.uint8)
    qb = np.frombuffer(oriented_qual.encode(), dtype=np.uint8)
    hb = np.frombuffer(hap_seq.encode(), dtype=np.uint8)

    is_md = op != CIGAR_I
    p = window_start + ref_pos
    if is_md.any():
        pm = p[is_md]
        if pm.min() < 0 or pm.max() >= len(hb):
            return None
        lv_md = hap_levels[pm]
    else:
        lv_md = np.zeros(0, dtype=np.int64)

    # gap run before each op: for the k-th M/D op (k>0), levels skipped since
    # the previous M/D op; insertions and the first M/D op get 0
    gap_runs = np.zeros(len(op), dtype=np.int64)
    md_idx = np.nonzero(is_md)[0]
    if len(md_idx) > 1:
        gap_runs[md_idx[1:]] = np.maximum(np.diff(lv_md) - 1, 0)
    n_cols = int(gap_runs.sum()) + len(op)
    offsets = np.cumsum(gap_runs + 1) - 1        # column index of each op

    levels = np.full(n_cols, -1, dtype=np.int64)
    graph_c = np.full(n_cols, GAP, dtype=np.uint8)
    seq_c = np.full(n_cols, GAP, dtype=np.uint8)
    quals = np.zeros(n_cols, dtype=np.uint8)

    # gap columns: for op k with run g>0, columns offsets[k]-g .. offsets[k]-1
    # carry levels lv_prev+1 .. lv_now-1 (graph '_', seq '_')
    with_gaps = np.nonzero(gap_runs > 0)[0]
    if len(with_gaps):
        runs = gap_runs[with_gaps]
        total = int(runs.sum())
        # start level of each run = level of this op - run length
        start_lv = hap_levels[p[with_gaps]] - runs
        rep_start = np.repeat(start_lv, runs)
        rep_off = np.repeat(offsets[with_gaps] - runs, runs)
        within = np.arange(total) - np.repeat(np.cumsum(runs) - runs, runs)
        levels[rep_off + within] = rep_start + within

    # op columns
    md_cols = offsets[is_md]
    levels[md_cols] = lv_md
    graph_c[md_cols] = hb[p[is_md]]
    m_mask = op == CIGAR_M
    m_cols = offsets[m_mask]
    seq_c[m_cols] = rb[read_pos[m_mask]]
    quals[m_cols] = qb[read_pos[m_mask]]
    i_mask = op == CIGAR_I
    i_cols = offsets[i_mask]
    seq_c[i_cols] = rb[read_pos[i_mask]]
    quals[i_cols] = qb[read_pos[i_mask]]

    return GraphAlignment(
        levels=levels, graph_c=graph_c, seq_c=seq_c, seq_qual=quals,
        reverse=reverse, seq_idx=seq_idx,
    )


def score_alignment(al: GraphAlignment, long_read_mode: bool = False) -> float:
    """Per-column alignment log-likelihood — faithful vectorised port of
    extensionAligner::scoreOneAlignment (extensionAligner.cpp:52-185):
    insertion rate 0.001 (0.075 long reads) + log(1/4) per inserted base,
    deletion ditto, match log(pCorrect) / mismatch log((1-pCorrect)/3) with
    pCorrect capped at 0.999, floored at 1e-5."""
    p = 0.075 if long_read_mode else 0.001
    log_ins = np.log(p)
    log_del = np.log(p)
    log_mm = np.log(1.0 - 2 * p)

    seq_gap = al.seq_c == GAP
    graph_gap = al.graph_c == GAP

    table = phred_to_p_correct_table(conservative_cap=0.999, floor=1e-5)
    p_corr = table[al.seq_qual]

    ll = np.zeros(al.n_columns, dtype=np.float64)
    # seq non-gap, graph gap: insertion
    ins = (~seq_gap) & graph_gap
    ll[ins] = log_ins + np.log(0.25)
    # both defined: match/mismatch
    both = (~seq_gap) & (~graph_gap)
    match = both & (al.seq_c == al.graph_c)
    mism = both & (al.seq_c != al.graph_c)
    ll[match] = log_mm + np.log(p_corr[match])
    ll[mism] = log_mm + np.log((1.0 - p_corr[mism]) / 3.0)
    # seq gap, graph non-gap: deletion
    dele = seq_gap & (~graph_gap)
    ll[dele] = log_del
    # seq gap + graph gap: intrinsic graph gap, likelihood 1
    return float(ll.sum())


def alignment_fraction_ok(al: GraphAlignment) -> float:
    """HLATyper::alignmentFractionOK (HLATyper.cpp:3082-3101)."""
    both_gap = (al.graph_c == GAP) & (al.seq_c == GAP)
    checked = ~both_gap
    n_checked = int(checked.sum())
    if n_checked == 0:
        return 0.0
    ok = checked & (al.graph_c == al.seq_c)
    return float(ok.sum()) / n_checked


def alignment_weighted_ok_fraction(al: GraphAlignment) -> float:
    """HLATyper::alignmentWeightedOKFraction: 1 - weightedMismatches /
    consideredPositions, where a graph-gap opposite a base counts 1, a
    mismatch counts pCorrect (HLATyper.cpp:3001-3080)."""
    table = phred_to_p_correct_table(conservative_cap=None, floor=None)
    seq_base = al.seq_c != GAP
    graph_gap = al.graph_c == GAP
    weighted = 0.0
    considered = 0
    p_corr = table[al.seq_qual]
    for c in np.nonzero(seq_base)[0]:
        considered += 1
        if graph_gap[c]:
            weighted += 1.0
        elif al.seq_c[c] != al.graph_c[c]:
            weighted += max(float(p_corr[c]), 0.0)
    if considered == 0:
        return 0.0
    return 1.0 - weighted / considered


def strands_valid(a1: GraphAlignment, a2: GraphAlignment) -> bool:
    """alignerBase::alignedReadPair_strandsValid (alignerBase.cpp:213-244)."""
    if a1.first_level() == -1 or a2.first_level() == -1:
        return False
    if a1.reverse == a2.reverse:
        return False
    if not a1.reverse:
        return a1.first_level() < a2.first_level()
    return a1.last_level() > a2.last_level()


def pair_distance_graph_levels(a1: GraphAlignment, a2: GraphAlignment) -> int:
    """alignerBase::alignedReadPair_pairsDistanceInGraphLevels
    (alignerBase.cpp:246-288)."""
    if a1.first_level() < a2.first_level():
        return a2.first_level() - a1.last_level() - 1
    return a1.first_level() - a2.last_level() - 1


def _anchors(al: GraphAlignment, from_end: bool, scan: int,
             level_to_seqpos: dict[int, dict[int, int]]) -> dict[int, int]:
    lv = al.levels[al.levels >= 0]
    if len(lv) == 0:
        return {}
    take = lv[-scan:] if from_end else lv[:scan]
    out: dict[int, int] = {}
    order = reversed(take.tolist()) if from_end else iter(take.tolist())
    for l in order:
        m = level_to_seqpos.get(int(l))
        if m:
            for sid, pos in m.items():
                out.setdefault(sid, pos)
    return out


def pair_distances_underlying(a1: GraphAlignment, a2: GraphAlignment,
                              level_to_seqpos: dict[int, dict[int, int]]
                              ) -> set[int]:
    """alignerBase::alignedReadPair_pairsDistancesUnderlyingSequences
    (alignerBase.cpp:290-334): distance between mate end/start positions on
    each shared underlying linearized sequence."""
    scan = 2
    if a1.first_level() < a2.first_level():
        end1 = _anchors(a1, True, scan, level_to_seqpos)
        beg2 = _anchors(a2, False, scan, level_to_seqpos)
        return {beg2[sid] - p - 1 for sid, p in end1.items() if sid in beg2}
    end2 = _anchors(a2, True, scan, level_to_seqpos)
    beg1 = _anchors(a1, False, scan, level_to_seqpos)
    return {beg1[sid] - p - 1 for sid, p in end2.items() if sid in beg1}
