"""Host-side process parallelism for the alignment pipeline.

The reference is thread-ready around its per-read-pair loop (OpenMP pragmas,
commented out in the snapshot — processBAM.cpp:2076; typing uses
`--maxThreads`).  Reads are i.i.d., so the TPU framework parallelises the
host work (seeding, backtrace, projection, pair selection) across worker
processes, each owning a full numpy ReadAligner built from the compiled
graph package.  Workers are spawned (not forked) so they never share the
main process's TPU client state.
"""

from __future__ import annotations

import multiprocessing as mp
import os

_WORKER_ALIGNER = None


def _init_worker(graph_dir: str, band: int, kmer_k: int, long_reads: str):
    global _WORKER_ALIGNER
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ..graph.package import GraphPackage
    from ..utils.config import RunConfig
    from .aligner import ReadAligner
    cfg = RunConfig(long_reads=long_reads)
    _WORKER_ALIGNER = ReadAligner(GraphPackage(graph_dir), cfg, band=band,
                                  kmer_k=kmer_k, use_jax=False)


def _align_chunk(args):
    pairs, insert_mean, insert_sd = args
    return _WORKER_ALIGNER.align_pairs(pairs, insert_mean, insert_sd)


def _align_unpaired_chunk(reads):
    return _WORKER_ALIGNER.align_unpaired(reads)


class ParallelAligner:
    """Drop-in align_pairs/align_unpaired over a process pool."""

    def __init__(self, graph_dir: str, n_workers: int, band: int = 32,
                 kmer_k: int = 20, long_reads: str = ""):
        ctx = mp.get_context("spawn")
        self.n_workers = max(1, n_workers)
        self.pool = ctx.Pool(self.n_workers, initializer=_init_worker,
                             initargs=(graph_dir, band, kmer_k, long_reads))

    def align_pairs(self, pairs, insert_mean, insert_sd, truth=None):
        if not pairs:
            return []
        chunk = max(64, -(-len(pairs) // (self.n_workers * 2)))
        chunks = [pairs[i:i + chunk] for i in range(0, len(pairs), chunk)]
        results = self.pool.map(
            _align_chunk, [(c, insert_mean, insert_sd) for c in chunks])
        out = [ap for res in results for ap in res]
        if truth is not None:
            by_id = {ap.read_id: ap for ap in out}
            for r1, r2 in pairs:
                ap = by_id.get(r1.name)
                if ap is None:
                    continue
                truth.evaluate(f"{r1.name}/1",
                               ap.chain1.aligned_levels_per_base(len(r1.seq)),
                               ap.chain1.reverse)
                truth.evaluate(f"{r2.name}/2",
                               ap.chain2.aligned_levels_per_base(len(r2.seq)),
                               ap.chain2.reverse)
        return out

    def align_unpaired(self, reads, truth=None):
        if not reads:
            return []
        chunk = max(64, -(-len(reads) // (self.n_workers * 2)))
        chunks = [reads[i:i + chunk] for i in range(0, len(reads), chunk)]
        results = self.pool.map(_align_unpaired_chunk, chunks)
        out = [al for res in results for al in res]
        if truth is not None:
            for r, al in zip(reads, out):
                if al is not None:
                    truth.evaluate(r.name,
                                   al.aligned_levels_per_base(len(r.seq)),
                                   al.reverse)
        return out

    def close(self):
        self.pool.close()
        self.pool.join()
