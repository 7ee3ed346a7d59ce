"""End-to-end HLA typing workflow (reference L5: alignReads_and_inferHLA,
processBAM.cpp:1788-1923 + the HLA action, HLA-LA.cpp:577-811).

Input: paired FASTQ (short reads) or unpaired FASTQ (long-read mode) already
extracted from a BAM/CRAM (see cli.py for extraction), plus a graph package.
Output: the reference-compatible result-file set in the working directory.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..graph.package import GraphPackage
from ..io.fastq import FastqRead, read_fastq
from ..utils.config import RunConfig
from ..utils.timing import Timer, log_progress
from .aligner import AlignedPair, ReadAligner
from .typer import HLATyper, LocusResult


@dataclass
class PipelineResult:
    results: list[LocusResult]
    n_pairs_input: int
    n_pairs_aligned: int
    reads_per_sec: float
    insert_mean: float
    insert_sd: float


def pair_up_fastq(fq1: str, fq2: str) -> list[tuple[FastqRead, FastqRead]]:
    r1 = list(read_fastq(fq1))
    r2 = {r.name: r for r in read_fastq(fq2)}
    out = []
    for a in r1:
        b = r2.get(a.name)
        if b is not None:
            out.append((a, b))
    return out


def build_decoy(pkg: GraphPackage, cfg: RunConfig):
    """Decoy k-mer index for the paralog defense (mapAgainstCompleteGenome
    equivalent).  Source: cfg.decoy_fasta if given, else the package's
    extendedReferenceGenome (minus PRG_* contigs) when
    cfg.map_against_complete_genome is set.  Returns DecoyIndex or None."""
    from ..mapping.decoy import DecoyIndex
    path = None
    if cfg.decoy_fasta:
        path = cfg.decoy_fasta
    elif cfg.map_against_complete_genome:
        path = pkg.extended_reference_path()
        if path is None:
            log_progress("WARNING: mapAgainstCompleteGenome requested but "
                         "the package has no extendedReferenceGenome — "
                         "paralog defense disabled")
            return None
    if path is None:
        return None
    from ..io.fasta import read_fasta
    cache = os.path.join(pkg.dir, "mapping_PRGonly", "decoyIndex_k20.npz")
    return DecoyIndex.from_fasta(read_fasta(path), cache_path=cache,
                                 source_path=path)


def run_hla_typing(pkg: GraphPackage,
                   pairs: list[tuple[FastqRead, FastqRead]] | None = None,
                   unpaired: list[FastqRead] | None = None,
                   output_dir: str = ".",
                   cfg: RunConfig | None = None,
                   backend: str = "auto",
                   truth=None) -> PipelineResult:
    cfg = cfg or RunConfig()
    pairs = pairs or []
    unpaired = unpaired or []
    long_mode = cfg.long_reads
    os.makedirs(output_dir, exist_ok=True)

    decoy = build_decoy(pkg, cfg)
    if decoy is not None:
        log_progress("paralog defense active (decoy k-mer index, "
                     f"{len(decoy.index.seq_names)} decoy contigs)")
    aligner = ReadAligner(pkg, cfg, use_jax=(backend == "jax"),
                          sharded=(backend == "sharded"), decoy=decoy)

    insert_mean, insert_sd = 300.0, 100.0
    if pairs:
        log_progress("estimating insert size distribution")
        insert_mean, insert_sd = aligner.estimate_insert_size(pairs)
        log_progress(f"insert size estimate: mean {insert_mean}, sd {insert_sd}")

    par = None
    if cfg.max_threads > 1 and (len(pairs) + len(unpaired)) > 512:
        from .parallel_host import ParallelAligner, spawn_safe
        if spawn_safe():
            log_progress(f"aligning with {cfg.max_threads} worker processes")
            par = ParallelAligner(
                pkg.dir, cfg.max_threads, long_reads=cfg.long_reads,
                decoy_fasta=cfg.decoy_fasta,
                map_complete=cfg.map_against_complete_genome)
        else:
            log_progress("worker processes unavailable (no file-backed "
                         "__main__); aligning serially")

    aligned_pairs: list[AlignedPair] = []
    kept_pairs: list[tuple[FastqRead, FastqRead]] = []
    aligned_unpaired = []
    kept_unpaired: list[FastqRead] = []
    bs = cfg.batch_size
    with Timer("align") as t:
        engine = par if par is not None else aligner
        for lo in range(0, len(pairs), bs):
            batch = pairs[lo:lo + bs]
            out = engine.align_pairs(batch, insert_mean, insert_sd,
                                     truth=truth)
            by_id = {p.read_id: p for p in out}
            for pr in batch:
                ap = by_id.get(pr[0].name)
                if ap is not None:
                    aligned_pairs.append(ap)
                    kept_pairs.append(pr)
        for lo in range(0, len(unpaired), bs):
            batch = unpaired[lo:lo + bs]
            out = engine.align_unpaired(batch, truth=truth)
            for r, al in zip(batch, out):
                if al is not None:
                    aligned_unpaired.append(al)
                    kept_unpaired.append(r)
    n_reads = 2 * len(pairs) + len(unpaired)
    rps = t.rate(n_reads)
    log_progress(f"aligned {len(aligned_pairs)}/{len(pairs)} pairs + "
                 f"{len(aligned_unpaired)}/{len(unpaired)} unpaired "
                 f"({rps:.1f} reads/s)")

    _write_reads_per_level(aligned_pairs, aligned_unpaired,
                           pkg, output_dir)
    # end-of-alignment statistics (reference prints aligner::statistics,
    # processBAM.cpp:1860)
    aligner.stats.n_align_calls += len(aligned_pairs)
    log_progress(aligner.stats.report())

    # typing outputs go into <outputDirectory>/hla/ like the reference
    # (outputDirectory_for_HLA, processBAM.cpp:1805); the coverage track and
    # alignment-level files stay at the top level
    hla_dir = os.path.join(output_dir, "hla")
    typer = HLATyper(pkg, cfg.typer, backend=backend)
    try:
        # the warm alignment workers (package in memory) also serve
        # per-locus typing — no reload cost
        results = typer.type_all(kept_pairs, aligned_pairs, kept_unpaired,
                                 aligned_unpaired, insert_mean, insert_sd,
                                 hla_dir, long_reads_mode=long_mode,
                                 n_workers=cfg.max_threads,
                                 worker_pool=par)
    finally:
        if par is not None:
            par.close()
    return PipelineResult(results, len(pairs), len(aligned_pairs), rps,
                          insert_mean, insert_sd)


def _write_reads_per_level(aligned_pairs, aligned_unpaired, pkg, output_dir):
    """Coverage track `reads_per_level.txt` (processBAM.cpp:1902-1913)."""
    n_levels = pkg.compiled().n_levels
    counts = np.zeros(n_levels, dtype=np.int64)
    chains = [c for ap in aligned_pairs for c in (ap.chain1, ap.chain2)]
    chains += [c for c in aligned_unpaired if c is not None]
    for ch in chains:
        lv = ch.levels[ch.levels >= 0]
        if len(lv):
            counts[lv.astype(np.int64)] += 1
    with open(os.path.join(output_dir, "reads_per_level.txt"), "w") as fh:
        for lv, n in enumerate(counts.tolist()):
            fh.write(f"{lv}\t{n}\n")
