"""Seed candidate generation: k-mer hits -> diagonal-consistent candidates.

Produces, per read, a small set of (sequence, strand, window offset)
candidates — the role the bwa `-a` multi-hit output plays in the reference
(protoSeeds grouping, processBAM.cpp:521-701).  Each candidate later becomes
one banded-NW alignment against the haplotype window, projected into graph
coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kmer_index import KmerIndex


@dataclass
class Candidate:
    seq_idx: int          # index into index.seq_names
    reverse: bool
    ref_start: int        # window anchor: position in the haplotype that the
                          # first base of the (oriented) read aligns to
    n_kmers: int          # chaining support
    span: int             # read-span covered by the chain

    @property
    def key(self) -> tuple:
        return (self.seq_idx, self.reverse, self.ref_start)


@dataclass
class Seeder:
    index: KmerIndex
    max_candidates: int = 6      # candidates kept per read (bwa -a analogue)
    diagonal_slack: int = 12     # hits within this diagonal band chain together
    min_chain_kmers: int = 2

    def candidates(self, seq: str) -> list[Candidate]:
        hits = self.index.query_read(seq)
        cands: list[Candidate] = []
        for is_rev, (read_pos, global_pos) in hits.items():
            if len(read_pos) == 0:
                continue
            seq_idx, ref_pos = self.index.locate(global_pos)
            diag = ref_pos - read_pos
            qdiag = diag // self.diagonal_slack
            min_k = (self.min_chain_kmers
                     if len(read_pos) >= self.min_chain_kmers else 1)
            for shift in (0, 1):
                # group by (seq, quantised diagonal); sort groups internally
                # by diagonal so the group midpoint is the median diagonal
                key = (seq_idx.astype(np.int64) * (1 << 33)
                       + (qdiag + shift))
                order = np.lexsort((diag, key))
                ks = key[order]
                starts = np.concatenate(
                    [[0], np.nonzero(np.diff(ks))[0] + 1])
                ends = np.concatenate([starts[1:], [len(ks)]])
                sizes = ends - starts
                keep = sizes >= min_k
                rp_sorted = read_pos[order]
                diag_sorted = diag[order]
                for s, e in zip(starts[keep], ends[keep]):
                    g = order[s:e]
                    rp = rp_sorted[s:e]
                    rp_min, rp_max = int(rp.min()), int(rp.max())
                    n_uniq = len(np.unique(rp)) if e - s > 1 else 1
                    cands.append(Candidate(
                        seq_idx=int(seq_idx[g[0]]),
                        reverse=is_rev,
                        ref_start=int(diag_sorted[(s + e) // 2]),
                        n_kmers=n_uniq,
                        span=rp_max - rp_min + self.index.k,
                    ))
        # dedupe near-identical candidates (same seq/strand, close ref_start),
        # keep the best-supported; then top max_candidates by support
        cands.sort(key=lambda c: (-c.n_kmers, -c.span))
        kept: list[Candidate] = []
        for c in cands:
            dup = False
            for kc in kept:
                if (kc.seq_idx == c.seq_idx and kc.reverse == c.reverse
                        and abs(kc.ref_start - c.ref_start) <= self.diagonal_slack * 2):
                    dup = True
                    break
            if not dup:
                kept.append(c)
            if len(kept) >= self.max_candidates:
                break
        return kept
