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

    def candidates_batch(self, seqs: list[str]) -> list[list[Candidate]]:
        """Vectorised candidate generation for a whole read batch: one k-mer
        encode + one index query + one lexsort across all (read, strand)
        hits."""
        from .kmer_index import encode_kmers, revcomp_bytes
        k = self.index.k
        per_read: list[list[Candidate]] = [[] for _ in seqs]
        if not seqs:
            return per_read
        # concatenate reads (per strand) with 1-byte separators
        for is_rev in (False, True):
            chunks = []
            offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
            cursor = 0
            for i, s in enumerate(seqs):
                b = np.frombuffer(s.encode(), dtype=np.uint8)
                if is_rev:
                    b = revcomp_bytes(b)
                chunks.append(b)
                chunks.append(np.array([0], dtype=np.uint8))  # separator
                offsets[i] = cursor
                cursor += len(b) + 1
            offsets[len(seqs)] = cursor
            cat = np.concatenate(chunks)
            codes, valid = encode_kmers(cat, k)
            qi, gp = self.index.query_codes(codes, valid)
            if len(qi) == 0:
                continue
            read_of = (np.searchsorted(offsets, qi, side="right") - 1)
            read_pos = qi - offsets[read_of]
            seq_idx, ref_pos = self.index.locate(gp)
            diag = ref_pos - read_pos
            qdiag = diag // self.diagonal_slack
            n_kmers_per_read = np.bincount(read_of, minlength=len(seqs))
            for shift in (0, 1):
                key = (read_of.astype(np.int64) * (1 << 50)
                       + seq_idx.astype(np.int64) * (1 << 33)
                       + (qdiag + shift))
                order = np.lexsort((diag, key))
                ks = key[order]
                starts = np.concatenate([[0],
                                         np.nonzero(np.diff(ks))[0] + 1])
                ends = np.concatenate([starts[1:], [len(ks)]])
                rp_sorted = read_pos[order]
                diag_sorted = diag[order]
                for s0, e0 in zip(starts, ends):
                    ri = int(read_of[order[s0]])
                    min_k = (self.min_chain_kmers
                             if n_kmers_per_read[ri] >= self.min_chain_kmers
                             else 1)
                    if e0 - s0 < min_k:
                        continue
                    rp = rp_sorted[s0:e0]
                    rp_min, rp_max = int(rp.min()), int(rp.max())
                    n_uniq = len(np.unique(rp)) if e0 - s0 > 1 else 1
                    per_read[ri].append(Candidate(
                        seq_idx=int(seq_idx[order[s0]]),
                        reverse=is_rev,
                        ref_start=int(diag_sorted[(s0 + e0) // 2]),
                        n_kmers=n_uniq,
                        span=rp_max - rp_min + k,
                    ))
        return [self._select(c) for c in per_read]

    def _select(self, cands: list[Candidate]) -> list[Candidate]:
        cands.sort(key=lambda c: (-c.n_kmers, -c.span))
        kept: list[Candidate] = []
        for c in cands:
            dup = False
            for kc in kept:
                if (kc.seq_idx == c.seq_idx and kc.reverse == c.reverse
                        and abs(kc.ref_start - c.ref_start)
                        <= self.diagonal_slack * 2):
                    dup = True
                    break
            if not dup:
                kept.append(c)
            if len(kept) >= self.max_candidates:
                break
        return kept

    def candidates(self, seq: str) -> list[Candidate]:
        return self.candidates_batch([seq])[0]
