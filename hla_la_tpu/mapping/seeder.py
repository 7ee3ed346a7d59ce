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
            # cluster by (seq, quantised diagonal)
            qdiag = diag // self.diagonal_slack
            for shift in (0, 1):
                key = seq_idx.astype(np.int64) * (1 << 33) + (qdiag + shift)
                order = np.argsort(key, kind="stable")
                ks = key[order]
                boundaries = np.nonzero(np.diff(ks))[0] + 1
                groups = np.split(order, boundaries)
                for g in groups:
                    if len(g) < self.min_chain_kmers and len(read_pos) >= self.min_chain_kmers:
                        continue
                    rp = read_pos[g]
                    uniq_rp = np.unique(rp)
                    d_med = int(np.median(diag[g]))
                    cands.append(Candidate(
                        seq_idx=int(seq_idx[g[0]]),
                        reverse=is_rev,
                        ref_start=d_med,
                        n_kmers=len(uniq_rp),
                        span=int(uniq_rp.max() - uniq_rp.min()) + self.index.k,
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
