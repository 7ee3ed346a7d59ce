"""Assembly typing (HLA-ASM).

Reference: HLA-ASM.pl (+HLA-ASM.md): map assembly contigs to the reference,
locate HLA gene/exon coordinates in the contigs, and call G-group genotypes
by minimum edit distance against the IMGT exon allele sequences; outputs
summary.txt + genePositions.tab (HLA-ASM.md:5-67).

TPU-native form: contig localisation uses the native k-mer seeder; the
per-allele edit distances are ONE batched banded-NW call (unit scoring) over
the allele panel — the same kernel as read alignment.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..graph.package import GraphPackage
from ..mapping.kmer_index import KmerIndex
from ..mapping.seeder import Seeder
from ..ops.banded_nw import NWScoring, banded_nw_forward
from ..sim.read_sim import revcomp
from ..utils.config import LOCI_2_EXONS

_ENC = np.full(256, 4, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _ENC[b] = i
    _ENC[b + 32] = i

EDIT_SCORING = NWScoring(match=0.0, mismatch=-1.0, gap_open=-1.0,
                         gap_extend=-1.0)


@dataclass
class AsmCall:
    locus: str
    contig: str
    allele: str
    edit_distance: int
    contig_pos: int
    n_candidates_at_min: int


class AssemblyTyper:
    def __init__(self, pkg: GraphPackage, band: int = 48):
        self.pkg = pkg
        self.band = band
        # allele DB per exon: {locus: {exon_file: {allele: gapless seq}}}
        # (contigs carry introns between exons, so each exon is located and
        # scored separately, then distances are summed per allele — matches
        # HLA-ASM's per-exon IMGT comparison)
        self.allele_db: dict[str, dict[str, dict[str, str]]] = {}
        from .typer import HLATyper
        t = HLATyper(pkg)
        for locus in t.loci:
            per_exon: dict[str, dict[str, str]] = {}
            for exon_id, fn in t.graph_genes[locus].items():
                if exon_id not in LOCI_2_EXONS.get(locus, []):
                    continue
                _, rows = pkg.read_segment(fn)
                alleles = {}
                for allele, vals in rows.items():
                    if ":" not in allele:
                        continue
                    s = "".join(vals).replace("_", "")
                    if "*" not in s and s:
                        alleles[allele] = s
                if alleles:
                    per_exon[exon_id] = alleles
            if per_exon:
                self.allele_db[locus] = per_exon
        self._typer = t

    def type_contigs(self, contigs: dict[str, str]) -> list[AsmCall]:
        index = KmerIndex.build(contigs, k=20)
        seeder = Seeder(index)
        names = index.seq_names
        calls: list[AsmCall] = []
        for locus, per_exon in self.allele_db.items():
            # accumulate per-contig, per-allele distances across exons
            per_contig: dict[str, dict[str, float]] = {}
            per_contig_pos: dict[str, int] = {}
            n_exons_hit: dict[str, int] = {}
            for exon_id, alleles in per_exon.items():
                probe = next(iter(alleles.values()))
                seen = set()
                for c in seeder.candidates(probe):
                    contig_name = names[c.seq_idx]
                    if contig_name in seen:
                        continue
                    seen.add(contig_name)
                    contig_seq = contigs[contig_name]
                    if c.reverse:
                        contig_seq = revcomp(contig_seq)
                        ref_start = (len(contig_seq) - c.ref_start
                                     - len(probe))
                    else:
                        ref_start = c.ref_start
                    dists = self._exon_distances(alleles, contig_seq,
                                                 ref_start)
                    if dists is None:
                        continue
                    slot = per_contig.setdefault(contig_name, {})
                    for a, d in dists.items():
                        slot[a] = slot.get(a, 0.0) + d
                    per_contig_pos.setdefault(contig_name, int(ref_start))
                    n_exons_hit[contig_name] = \
                        n_exons_hit.get(contig_name, 0) + 1
            for contig_name, dist_map in per_contig.items():
                if n_exons_hit.get(contig_name, 0) < len(per_exon):
                    continue
                best_a = min(dist_map, key=lambda a: dist_map[a])
                best_d = int(round(dist_map[best_a]))
                total_len = sum(len(per_exon[e].get(best_a, ""))
                                for e in per_exon)
                if total_len and best_d > 0.3 * total_len:
                    continue
                n_min = sum(1 for d in dist_map.values()
                            if int(round(d)) == best_d)
                calls.append(AsmCall(
                    locus=locus, contig=contig_name, allele=best_a,
                    edit_distance=best_d,
                    contig_pos=per_contig_pos[contig_name],
                    n_candidates_at_min=n_min))
        return calls

    def _exon_distances(self, alleles: dict[str, str], contig_seq: str,
                        ref_start: int) -> dict[str, float] | None:
        """Banded unit-cost edit distance of every allele exon sequence vs
        the located contig window — one batched NW call."""
        names = list(alleles)
        seqs = [alleles[n] for n in names]
        Lmax = max(len(s) for s in seqs)
        W = self.band
        B = len(seqs)
        reads = np.full((B, Lmax), 4, dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int64)
        refs = np.full((B, Lmax + W), 4, dtype=np.uint8)
        lo = ref_start - W // 2
        cb = contig_seq.encode()
        src_lo, src_hi = max(lo, 0), min(lo + Lmax + W, len(cb))
        window = np.full(Lmax + W, 4, dtype=np.uint8)
        if src_hi > src_lo:
            window[src_lo - lo:src_hi - lo] = _ENC[
                np.frombuffer(cb[src_lo:src_hi], np.uint8)]
        for bi, s in enumerate(seqs):
            reads[bi, :len(s)] = _ENC[np.frombuffer(s.encode(), np.uint8)]
            lens[bi] = len(s)
            refs[bi] = window
        scores, _, _, _ = banded_nw_forward(reads, lens, refs, EDIT_SCORING)
        if not np.isfinite(scores).any() or scores.max() <= -1e29:
            return None
        return {n: float(-s) for n, s in zip(names, scores)}

    def write_outputs(self, calls: list[AsmCall], out_dir: str) -> None:
        """summary.txt + genePositions.tab (HLA-ASM.md output contract)."""
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "summary.txt"), "w") as fh:
            fh.write("Locus\tContig\tAllele\tEditDistance\tAllelesAtMin\n")
            for c in calls:
                g, _ = self._typer.translate_to_g([c.allele]) \
                    if self._typer.can_translate_locus(c.locus) \
                    else (c.allele, True)
                fh.write(f"{c.locus}\t{c.contig}\t{g}\t{c.edit_distance}\t"
                         f"{c.n_candidates_at_min}\n")
        with open(os.path.join(out_dir, "genePositions.tab"), "w") as fh:
            fh.write("Locus\tContig\tPosition\n")
            for c in calls:
                fh.write(f"{c.locus}\t{c.contig}\t{c.contig_pos}\n")
