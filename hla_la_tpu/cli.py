"""Command-line interface — the orchestration layer.

Replaces both the Perl driver (HLA-LA.pl: path discovery, BAM compatibility
check via knownReferences, read extraction, FASTQ conversion) and the C++
action dispatcher (HLA-LA.cpp:104-129 `--action` modes).  No external tools:
extraction and FASTQ conversion use the native BAM codec (io/bam.py), seeding
uses the native k-mer index.

Actions:
  HLA            production typing from --BAM or --FASTQ1/--FASTQ2/--FASTQU
  prepareGraph   compile the graph package to dense arrays (serializedGRAPH)
  testBinary     smoke test (reference prints 'HLA*LA binary functional!')
  simulate       write a simulated graph package + reads with truth
  testPRGMapping simulation round-trip: simulate reads -> align -> accuracy
  TestHLATyping  simulate diploid individual -> type -> compare
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hla-la-tpu", description=__doc__)
    ap.add_argument("--action", default="HLA")
    ap.add_argument("--BAM")
    ap.add_argument("--FASTQ1")
    ap.add_argument("--FASTQ2")
    ap.add_argument("--FASTQU")
    ap.add_argument("--graph", help="graph package directory")
    ap.add_argument("--sampleID", default="sample")
    ap.add_argument("--workingDir", default=".")
    ap.add_argument("--longReads", default="",
                    choices=["", "ont2d", "pacbio"])
    ap.add_argument("--maxThreads", type=int, default=1)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "numpy", "jax", "sharded"])
    ap.add_argument("--moreReferencesDir", default=None)
    ap.add_argument("--ref", help="reference genome FASTA (required to "
                    "decode reference-based CRAM input)")
    ap.add_argument("--mapAgainstCompleteGenome", type=int, default=0,
                    help="1 = paralog defense via decoy index over the "
                    "package's extendedReferenceGenome (HLA-LA.cpp:617)")
    ap.add_argument("--keepExtractedFastq", type=int, default=0,
                    help="with --action HLA: write the extracted reads as "
                         "R_1/R_2/R_U.fastq in the output directory (the "
                         "reference keeps these, HLA-LA.pl:465-502)")
    ap.add_argument("--extractExonkMerCounts", type=int, default=0,
                    help="with --action HLA: also write per-exon k-mer "
                         "counts over the extracted reads "
                         "(HLA-LA.pl:543-552)")
    ap.add_argument("--decoyFasta", default="",
                    help="explicit decoy genome FASTA for the paralog "
                    "defense (overrides extendedReferenceGenome)")
    ap.add_argument("--outputDirectory", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trueHLA", help="truth table for concordance evaluation")
    ap.add_argument("--ASMfasta", help="assembly contigs for --action ASM")
    ap.add_argument("--ALTpanel", help="linear ALT panel (package dir or "
                    "FASTA) for --action KIR / buildKIRpanel output dir")
    ap.add_argument("--annotations", help="gene annotation TSV "
                    "(hap gene start0 stop0) for --action buildKIRpanel")
    ap.add_argument("--validationBAMs", help="sample sheet for --action validate")
    ap.add_argument("--resolution", type=int, default=2,
                    help="nomenclature fields compared in evaluation")
    ap.add_argument("--nHosts", type=int, default=1,
                    help="multi-host sharding: total hosts (validate: "
                         "cohort rows; HLA: read-slice alignment shards)")
    ap.add_argument("--hostIdx", type=int, default=0,
                    help="multi-host cohort sharding: this host's index")
    ap.add_argument("--shardDir",
                    help="--action HLA with --nHosts>1: directory this "
                         "host's align shard is written to")
    ap.add_argument("--mergeShards",
                    help="--action HLA: merge align shards from this "
                         "directory and run typing (no read input needed)")
    ap.add_argument("--out", help="output path (remapAndReduce: BAM; "
                                  "downsampleBAM: BAM or batch directory)")
    ap.add_argument("--fraction", type=float, default=None,
                    help="--action downsampleBAM: keep-pair probability")
    ap.add_argument("--targetGigabases", type=float, default=None,
                    help="--action downsampleBAM: depth target in Gb "
                         "(downsample_WGS_BAMs.pl semantics)")
    args = ap.parse_args(argv)

    action = args.action
    if action == "testBinary":
        print("hla-la-tpu binary functional!")
        return 0
    if action == "prepareGraph":
        return action_prepare_graph(args)
    if action == "HLA":
        return action_hla(args)
    if action == "simulate":
        return action_simulate(args)
    if action == "testPRGMapping":
        return action_test_prg_mapping(args)
    if action == "testPRGMappingUnpaired":
        return action_test_prg_mapping_unpaired(args)
    if action == "simulateFromNormalGenome":
        return action_simulate_from_genome(args)
    if action == "TestHLATyping":
        return action_test_hla_typing(args)
    if action == "checkSequencePresence":
        return action_check_presence(args)
    if action == "ASM":
        return action_asm(args)
    if action == "KIR":
        return action_kir(args)
    if action == "validate":
        return action_validate(args)
    if action == "extractkMerCounts":
        return action_extract_kmer_counts(args)
    if action == "KIRsimulation":
        return action_kir_simulation(args)
    if action == "buildKIRpanel":
        return action_build_kir_panel(args)
    if action == "globalAlignment":
        return action_global_alignment(args)
    if action == "graphFromMFA":
        return action_graph_from_mfa(args)
    if action == "findKIRinBAM":
        return action_find_kir_in_bam(args)
    if action == "oneSimulationFromPRG":
        return action_simulate(args)
    if action == "checkKIRgraph":
        return action_check_kir_graph(args)
    if action == "testAlignments2Chains":
        return action_test_alignments2chains(args)
    if action == "testChainExtension":
        return action_test_chain_extension(args)
    if action == "remapAndReduce":
        return action_remap_and_reduce(args)
    if action == "downsampleBAM":
        return action_downsample_bam(args)
    print(f"unknown action {action}", file=sys.stderr)
    return 2


def _require_graph(args):
    if not args.graph or not os.path.isdir(args.graph):
        raise SystemExit(f"--graph directory required (got {args.graph!r})")
    from .graph.package import GraphPackage
    return GraphPackage(args.graph)


def action_prepare_graph(args) -> int:
    pkg = _require_graph(args)
    from .utils.timing import log_progress
    log_progress("prepareGraph: parsing graph.txt and compiling dense arrays")
    c = pkg.prepare()
    log_progress(f"prepareGraph: done — {c.n_levels} levels, {c.n_nodes} "
                 f"nodes, {len(c.edge_from)} edges, {len(c.jump_from)} "
                 f"gap-jump paths -> {pkg.serialized_path}")
    return 0


def action_hla(args) -> int:
    from .io.bam import bam_to_fastq_pairs, extract_reads
    from .io.fastq import read_fastq
    from .models.pipeline import run_hla_typing
    from .utils.config import RunConfig
    from .utils.timing import log_progress

    pkg = _require_graph(args)
    out_dir = args.outputDirectory or os.path.join(
        args.workingDir, args.sampleID)
    os.makedirs(out_dir, exist_ok=True)
    if getattr(args, "extractExonkMerCounts", 0):
        # validate flag combinations BEFORE the (potentially hours-long)
        # extraction+typing run, not after it
        if args.longReads:
            raise SystemExit(
                "--extractExonkMerCounts is a short-read feature "
                "(HLA-LA.pl:545)")
        if args.nHosts > 1 or getattr(args, "mergeShards", None):
            raise SystemExit(
                "--extractExonkMerCounts is not available on sharded "
                "multi-host runs: counts must cover ALL reads — run "
                "--action extractkMerCounts on the full FASTQs instead")

    if getattr(args, "mergeShards", None):
        # multi-host HLA: typing over every host's align shard
        from .models.pipeline import merge_shards_and_type
        cfg = RunConfig(graph_dir=args.graph, sample_id=args.sampleID,
                        working_dir=args.workingDir,
                        long_reads=args.longReads,
                        max_threads=args.maxThreads)
        res = merge_shards_and_type(pkg, args.mergeShards, out_dir, cfg,
                                    backend=args.backend)
        log_progress(f"typing complete: {len(res.results)} loci -> "
                     f"{out_dir}/hla/R1_bestguess.txt")
        return 0

    pairs, unpaired = [], []
    for p in (args.BAM, args.FASTQ1, args.FASTQ2, args.FASTQU, args.ref):
        if p and not os.path.exists(p):
            raise SystemExit(f"input file not found: {p}")
    if args.BAM:
        log_progress(f"extracting reads from {args.BAM}")
        from .io.bam import BamReader, is_cram
        cram_reference = None
        if is_cram(args.BAM):
            if args.ref:
                from .io.fasta import read_fasta
                cram_reference = read_fasta(args.ref)
            from .io.cram import CramReader
            # keep ONE buffered reader: extract_reads reuses it instead of
            # re-reading the (potentially multi-hundred-MB) file
            cram_reference = CramReader(args.BAM, reference=cram_reference)
            contigs = cram_reference.contigs()
        else:
            # header only: stream (native would inflate the whole file)
            contigs = BamReader(args.BAM, use_native=False).contigs()
        # knownReferences specs are written against `samtools idxstats`
        # output, which always ends with a `*  0` unmapped line
        # (HLA-LA.pl:259-277) — add it so real specs can match
        idx_contigs = dict(contigs)
        idx_contigs.setdefault("*", 0)
        more = [args.moreReferencesDir] if args.moreReferencesDir else []
        spec_path = pkg.match_known_reference(idx_contigs, more)
        if spec_path is None and "*" not in contigs:
            # simulated/legacy specs without the `*` row
            spec_path = pkg.match_known_reference(contigs, more)
        regions, include_unmapped = None, True
        if spec_path is not None:
            log_progress(f"matched known reference {spec_path}")
            regions, include_unmapped = _regions_from_spec(pkg, spec_path)
        else:
            log_progress("WARNING: BAM reference not in knownReferences — "
                         "extracting ALL reads")
        by_name, _ = extract_reads(args.BAM, regions,
                                   include_unmapped=include_unmapped,
                                   cram_reference=cram_reference)
        pairs, unpaired = bam_to_fastq_pairs(by_name)
        if args.longReads:
            unpaired += [r for p in pairs for r in p]
            pairs = []
            unpaired = _split_long_reads(unpaired)
    else:
        if args.FASTQ1 and args.FASTQ2:
            from .models.pipeline import pair_up_fastq
            pairs = pair_up_fastq(args.FASTQ1, args.FASTQ2)
        if args.FASTQU:
            unpaired = list(read_fastq(args.FASTQU))
        if args.longReads:
            # long-read mode is unpaired: flatten any paired input too
            # (mirrors the BAM path; >50kb reads split per HLA-LA.pl:503)
            unpaired += [r for p in pairs for r in p]
            pairs = []
            unpaired = _split_long_reads(unpaired)
    if not pairs and not unpaired:
        raise SystemExit("no input reads (--BAM or --FASTQ1/--FASTQ2/--FASTQU)")
    if unpaired and not args.longReads:
        from .utils.config import TyperConfig
        min_len = TyperConfig().min_alignment_length_unpaired
        n_short = sum(len(r.seq) < min_len for r in unpaired)
        if n_short > len(unpaired) // 2:
            log_progress(
                f"WARNING: {n_short}/{len(unpaired)} unpaired reads are "
                f"shorter than the {min_len}bp unpaired minimum "
                f"(HLATyper.cpp:1032) and will produce no typing "
                f"observations — short reads must be PAIRED "
                f"(--FASTQ1/--FASTQ2); use --longReads for long-read "
                f"input")
    if getattr(args, "keepExtractedFastq", 0):
        # the reference leaves the extraction FASTQs (R_1/R_2/R_U) in the
        # sample working dir (HLA-LA.pl:465-502); extraction here is
        # in-memory, so materialise them only on request
        from .io.fastq import write_fastq
        if pairs:
            write_fastq(os.path.join(out_dir, "R_1.fastq"),
                        [p[0] for p in pairs])
            write_fastq(os.path.join(out_dir, "R_2.fastq"),
                        [p[1] for p in pairs])
        if unpaired:
            write_fastq(os.path.join(out_dir, "R_U.fastq"), list(unpaired))
        log_progress(f"extraction FASTQs written to {out_dir}")

    cfg = RunConfig(graph_dir=args.graph, sample_id=args.sampleID,
                    working_dir=args.workingDir, long_reads=args.longReads,
                    max_threads=args.maxThreads,
                    map_against_complete_genome=bool(
                        args.mapAgainstCompleteGenome),
                    decoy_fasta=args.decoyFasta)
    if args.nHosts > 1:
        # multi-host HLA: align this host's read slice, write a shard
        from .models.pipeline import align_shard
        shard_dir = args.shardDir or os.path.join(out_dir, "align_shards")
        align_shard(pkg, pairs, unpaired, shard_dir, args.hostIdx,
                    args.nHosts, cfg, backend=args.backend)
        return 0
    res = run_hla_typing(pkg, pairs=pairs, unpaired=unpaired,
                         output_dir=out_dir, cfg=cfg, backend=args.backend)
    log_progress(f"typing complete: {len(res.results)} loci -> "
                 f"{out_dir}/hla/R1_bestguess.txt")
    if getattr(args, "extractExonkMerCounts", 0):
        # the reference runs extractkMerCounts.pl over the extracted FASTQs
        # as part of the HLA action (HLA-LA.pl:543-552); same here, over
        # the reads we just typed from (flag combos validated up front)
        _write_exon_kmer_counts(
            pkg, [r for p in pairs for r in p] + list(unpaired), out_dir)
    for r in res.results:
        a1, a2 = r.alleles_g_or_raw()
        print(f"{r.locus}\t{a1}\t{a2}\tQ1={r.q1_allele1:.4f}/"
              f"{r.q1_allele2:.4f}")
    if args.trueHLA:
        from .utils.nomenclature import (evaluate_types, read_truth_file)
        truth_all = read_truth_file(args.trueHLA)
        truth = truth_all.get(args.sampleID)
        if truth is None:
            log_progress(f"--trueHLA: no row for {args.sampleID}")
        else:
            inferred = {r.locus: (r.allele1_id, r.allele2_id)
                        for r in res.results}
            ev = evaluate_types(inferred, truth, args.resolution)
            print(f"truth concordance: {ev.n_alleles_correct}/"
                  f"{ev.n_alleles_total} alleles "
                  f"({ev.accuracy * 100:.1f}%) over {ev.n_loci} loci")
    return 0


def action_check_presence(args) -> int:
    """Check that sequences are emittable paths of the graph
    (testCheckPresence / checkSeq actions, HLA-LA.cpp:152, 1106-1148).
    Sequences come from --FASTQU (FASTA also accepted via --ASMfasta)."""
    pkg = _require_graph(args)
    prg = pkg.prg()
    seqs: dict[str, str] = {}
    if args.ASMfasta:
        from .io.fasta import read_fasta
        seqs.update(read_fasta(args.ASMfasta))
    if args.FASTQU:
        from .io.fastq import read_fastq
        seqs.update({r.name: r.seq for r in read_fastq(args.FASTQU)})
    if not seqs:
        # default self-test: simulated haplotypes must be graph paths
        import numpy as np
        rng = np.random.default_rng(args.seed or 1)
        ok = True
        for s, _, _ in prg.simulate_random_paths(10, rng):
            ok &= prg.path_emits(s)
        print("simulated-path presence check:", "OK" if ok else "FAILED")
        return 0 if ok else 1
    rc = 0
    for name, s in seqs.items():
        present = prg.path_emits(s)
        print(f"{name}\t{'present' if present else 'ABSENT'}")
        rc |= 0 if present else 1
    return rc


def action_asm(args) -> int:
    """Assembly typing (HLA-ASM.pl equivalent)."""
    from .io.fasta import read_fasta
    from .models.asm import AssemblyTyper
    pkg = _require_graph(args)
    if not args.ASMfasta:
        raise SystemExit("--ASMfasta required for --action ASM")
    contigs = read_fasta(args.ASMfasta)
    typer = AssemblyTyper(pkg)
    truth = None
    if args.trueHLA:
        from .utils.nomenclature import read_truth_file
        truth_all = read_truth_file(args.trueHLA)
        truth = truth_all.get(args.sampleID)
        if truth is None and len(truth_all) == 1:
            truth = next(iter(truth_all.values()))
    calls = typer.type_contigs(contigs, truth=truth)
    out_dir = args.outputDirectory or os.path.join(args.workingDir,
                                                   args.sampleID + "_ASM")
    typer.write_outputs(calls, out_dir, contigs=contigs)
    for c in calls:
        extra = ""
        if c.min_dist_called_truth is not None:
            extra = f"\ttruthED={c.min_dist_called_truth}"
        print(f"{c.locus}\t{c.contig}\t{';'.join(c.alleles_at_min)}\t"
              f"ED={c.edit_distance}{extra}")
    return 0


def action_kir(args) -> int:
    """Linear-ALT (KIR) typing (--action KIR, HLA-LA.cpp:812-905).

    --ALTpanel may be a linear-ALT package DIRECTORY (the reference's
    linearALTs layout; full workflow: region extraction from the BAM,
    haplotype-pair model with insert term, reads2Genes) or a bare FASTA
    (haplotype-pair model only)."""
    from .io.bam import (bam_to_fastq_pairs, estimate_insert_size_from_bam,
                         extract_reads)
    from .io.fasta import read_fasta
    from .io.fastq import read_fastq
    from .models.linear_alts import LinearALTsTyper
    if not args.ALTpanel:
        raise SystemExit("--ALTpanel (package dir or FASTA) required for "
                         "--action KIR")
    kir_pkg = None
    if os.path.isdir(args.ALTpanel):
        from .models.kir_package import KirPackage
        kir_pkg = KirPackage.load(args.ALTpanel)
        panel = kir_pkg.haplotypes
    else:
        panel = read_fasta(args.ALTpanel)
    pairs: list = []
    reads = []
    mean = sd = None
    if args.BAM:
        cram_reference = None
        if args.ref:
            from .io.bam import is_cram
            if is_cram(args.BAM):
                from .io.fasta import read_fasta
                cram_reference = read_fasta(args.ref)
        regions = None
        if kir_pkg is not None and kir_pkg.covered_regions:
            # extract only the covered regions (+ unmapped) —
            # extractReads_extendedReferenceGenome, linearALTs.h:37
            regions = [(c, a, b)
                       for c, (a, b) in kir_pkg.covered_regions.items()]
            mean, sd = estimate_insert_size_from_bam(
                args.BAM, cram_reference=cram_reference)
        by_name, _ = extract_reads(args.BAM, regions,
                                   cram_reference=cram_reference)
        pairs, unpaired = bam_to_fastq_pairs(by_name)
        reads = [r for p in pairs for r in p] + unpaired
    elif args.FASTQ1 and args.FASTQ2:
        # name-keyed pairing (positional zip silently mispairs/truncates
        # when one mate was dropped by upstream QC)
        from .models.pipeline import pair_up_fastq
        pairs = pair_up_fastq(args.FASTQ1, args.FASTQ2)
        reads = [r for p in pairs for r in p]
    elif args.FASTQU:
        reads = list(read_fastq(args.FASTQU))
    else:
        raise SystemExit("--BAM, --FASTQ1/2 or --FASTQU required for "
                         "--action KIR")
    genes = None
    if kir_pkg is not None and kir_pkg.annotations:
        spans: dict[str, tuple[int, int]] = {}
        for hap_spans in kir_pkg.annotations.values():
            for g, a, b in hap_spans:
                lo, hi = spans.get(g, (a, b))
                spans[g] = (min(lo, a), max(hi, b))
        genes = spans
    typer = LinearALTsTyper(panel, backend=args.backend, genes=genes,
                            n_is_gap=kir_pkg is not None)
    if pairs:
        # paired model incl. the insert-size term
        # (processCollectedAlignments, linearALTs.h:69)
        if mean is None:
            mean, sd = typer.estimate_insert(pairs)
        res = typer.type_diploid_paired(pairs, mean, sd)
    else:
        res = typer.type_diploid(reads)
    print(f"best ALT pair: {res.hap1} / {res.hap2} "
          f"(posterior {res.posterior:.4f})")
    out_dir = args.outputDirectory or os.path.join(args.workingDir,
                                                   args.sampleID + "_KIR")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "KIR_haplotypes.txt"), "w") as fh:
        fh.write("Haplotype1\tHaplotype2\tPosterior\n")
        fh.write(f"{res.hap1}\t{res.hap2}\t{res.posterior:.6f}\n")
    if genes:
        r2g = typer.reads_to_genes(reads)
        with open(os.path.join(out_dir, "reads2Genes.txt"), "w") as fh:
            fh.write("Gene\tNReads\tReadIDs\n")
            for g in sorted(r2g):
                fh.write(f"{g}\t{len(r2g[g])}\t"
                         f"{','.join(sorted(r2g[g]))}\n")
        print("reads2Genes: " + ", ".join(
            f"{g}={len(r2g[g])}" for g in sorted(r2g)))
    return 0


def action_global_alignment(args) -> int:
    """Chain-enriched global alignment of one query sequence against one
    reference (globalAlignment.pl equivalent).  --ASMfasta = query FASTA,
    --ref = reference FASTA, --outputDirectory/--workingDir for output."""
    from .io.fasta import read_fasta
    from .mapping.global_align import write_global_alignment
    if not args.ASMfasta or not args.ref:
        raise SystemExit("globalAlignment needs --ASMfasta <query.fa> "
                         "--ref <reference.fa>")
    query = next(iter(read_fasta(args.ASMfasta).values()))
    reference = next(iter(read_fasta(args.ref).values()))
    out = os.path.join(args.outputDirectory or args.workingDir,
                       "globalAlignment.txt")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    mism, strand = write_global_alignment(out, query, reference)
    print(f"globalAlignment: {mism} mismatches, strand {strand} -> {out}")
    return 0


def action_build_kir_panel(args) -> int:
    """Panel builder: aligned region haplotypes (MFA FASTA) + gene
    annotation TSV -> full linear-ALT package (the packaging step the
    reference performed offline from IPD-KIR data)."""
    from .io.fasta import read_fasta
    from .models.kir_package import build_kir_package
    if not args.ASMfasta or not args.ALTpanel:
        raise SystemExit("buildKIRpanel needs --ASMfasta <aligned.fa> "
                         "--ALTpanel <output dir> [--annotations <tsv>]")
    haps = read_fasta(args.ASMfasta)
    ann: dict[str, list[tuple[str, int, int]]] = {}
    if args.annotations:
        with open(args.annotations) as fh:
            fh.readline()
            for line in fh:
                f = line.rstrip("\n").split("\t")
                if len(f) >= 4:
                    ann.setdefault(f[0], []).append(
                        (f[1], int(f[2]), int(f[3])))
    covered = None
    pkg = build_kir_package(args.ALTpanel, haps, ann, covered)
    print(f"KIR panel written: {len(pkg.haplotypes)} haplotypes, "
          f"{len(pkg.genes())} genes -> {args.ALTpanel}")
    return 0


def action_validate(args) -> int:
    """Cohort validation (HLAtypeinference_validation.pl equivalent)."""
    from .validation import read_sample_sheet, validate_cohort
    pkg = _require_graph(args)
    if not args.validationBAMs or not args.trueHLA:
        raise SystemExit("--validationBAMs and --trueHLA required")
    samples = read_sample_sheet(args.validationBAMs)
    out_dir = args.outputDirectory or os.path.join(args.workingDir,
                                                   "validation")
    report = validate_cohort(pkg, samples, args.trueHLA, out_dir,
                             backend=args.backend,
                             resolution=args.resolution,
                             n_hosts=args.nHosts, host_idx=args.hostIdx,
                             ref=args.ref)
    print(f"cohort accuracy: {report.total_accuracy * 100:.2f}% over "
          f"{report.n_samples} samples "
          f"({len(report.discordant)} discordant calls)")
    return 0


def _regions_from_spec(pkg, spec_path: str):
    """knownReferences spec rows -> extraction regions (HLA-LA.pl:374-412).

    Parses the spec file directly: the matched spec may live in a
    --moreReferencesDir outside the package (r2 fix — the old lookup in the
    package's own dir raised KeyError for those)."""
    spec = pkg.known_references([os.path.dirname(spec_path)])[spec_path]
    regions = []
    include_unmapped = False
    for cid, rec in spec.items():
        if cid == "*":
            # the idxstats unmapped pseudo-contig: ExtractCompleteContig=1
            # means "also extract unmapped reads" (HLA-LA.pl:336-340, 415)
            include_unmapped = rec.get("ExtractCompleteContig") in ("1", "yes")
            continue
        if rec.get("ExtractCompleteContig") in ("1", "yes"):
            regions.append((cid, 0, 0))
        else:
            start = rec.get("PartialExtraction_Start") or ""
            stop = rec.get("PartialExtraction_Stop") or ""
            if start and stop:
                regions.append((cid, int(start) - 1, int(stop)))
    return regions, include_unmapped


def _split_long_reads(reads, chunk: int = 50000):
    """Reads >50kb are split into 50kb chunks (HLA-LA.pl:503-524)."""
    out = []
    for r in reads:
        if len(r.seq) <= chunk:
            out.append(r)
            continue
        for i in range(0, len(r.seq), chunk):
            from .io.fastq import FastqRead
            out.append(FastqRead(f"{r.name}:::chunk{i // chunk}",
                                 r.seq[i:i + chunk], r.qual[i:i + chunk]))
    return out


def action_simulate(args) -> int:
    from .sim.graph_sim import simulate_prg_package
    from .sim.read_sim import ReadSimulator, write_levels_file
    from .io.fastq import write_fastq

    rng = np.random.default_rng(args.seed or 0)
    out = args.workingDir
    sim = simulate_prg_package(rng)
    pkg = sim.write_package(os.path.join(out, "simulated_graph"))
    rs = ReadSimulator(rng)
    h1, h2 = 1, 2
    pairs = []
    for h in (h1, h2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 15.0,
                                               name_prefix=f"hap{h}")
    write_fastq(os.path.join(out, "R_1.fq"), [p.r1.to_fastq() for p in pairs])
    write_fastq(os.path.join(out, "R_2.fq"), [p.r2.to_fastq() for p in pairs])
    write_levels_file(os.path.join(out, "R_1.fq.levels"),
                      [p.r1 for p in pairs])
    write_levels_file(os.path.join(out, "R_2.fq.levels"),
                      [p.r2 for p in pairs])
    print(f"simulated package + {len(pairs)} read pairs (diploid "
          f"haplotypes {h1}/{h2}) in {out}")
    return 0


def action_test_prg_mapping(args) -> int:
    """Simulation round-trip (testPRGMapping, HLA-LA.cpp:1533-1621)."""
    from .graph.package import GraphPackage
    from .models.aligner import ReadAligner
    from .sim.graph_sim import simulate_prg_package
    from .sim.read_sim import ReadSimulator
    from .sim.truth import TrueReadLevels
    from .utils.timing import Timer

    rng = np.random.default_rng(args.seed or 99)
    sim = simulate_prg_package(rng)
    pkg = sim.write_package(os.path.join(args.workingDir, "testPRG_graph"))
    rs = ReadSimulator(rng)
    seq, levels = sim.linearized(1)
    pairs = rs.simulate_pairs_from_string(seq, levels, 10.0)
    truth = TrueReadLevels({})
    for p in pairs:
        truth.truth[p.r1.name + "/1"] = p.r1.levels
        truth.truth[p.r2.name + "/2"] = p.r2.levels
    aligner = ReadAligner(pkg, use_jax=(args.backend == "jax"))
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    with Timer() as t:
        aligned = aligner.align_pairs(fq, 110, 35, truth=truth)
    acc = truth.accuracy()
    rate = t.rate(2 * len(pairs))
    print(f"testPRGMapping: {len(aligned)}/{len(pairs)} pairs aligned, "
          f"per-base truth accuracy {acc:.4f}, {rate:.1f} reads/s")
    assert acc > 0.9, "accuracy regression"
    print("OK")
    return 0


def action_test_prg_mapping_unpaired(args) -> int:
    """Unpaired simulation round-trip (testPRGMappingUnpaired,
    HLA-LA.cpp:1386-1532)."""
    from .models.aligner import ReadAligner
    from .sim.graph_sim import simulate_prg_package
    from .sim.read_sim import ReadSimulator
    from .sim.truth import TrueReadLevels

    rng = np.random.default_rng(args.seed or 13)
    sim = simulate_prg_package(rng)
    pkg = sim.write_package(os.path.join(args.workingDir,
                                         "testPRGunpaired_graph"))
    rs = ReadSimulator(rng)
    seq, levels = sim.linearized(2)
    reads = rs.simulate_unpaired_from_string(seq, levels, 6.0,
                                             read_length=150)
    truth = TrueReadLevels({r.name: r.levels for r in reads})
    aligner = ReadAligner(pkg, use_jax=(args.backend == "jax"))
    # unpaired mapping test: no min-length gate here (HLA typing applies it)
    out = aligner.align_unpaired([r.to_fastq() for r in reads], truth=truth)
    n_ok = sum(1 for a in out if a is not None)
    acc = truth.accuracy()
    print(f"testPRGMappingUnpaired: {n_ok}/{len(reads)} aligned, "
          f"per-base truth accuracy {acc:.4f}")
    assert acc > 0.9
    print("OK")
    return 0


def action_simulate_from_genome(args) -> int:
    """Simulate paired reads from a plain FASTA (simulateFromNormalGenome,
    HLA-LA.cpp:1893)."""
    from .io.fasta import read_fasta
    from .io.fastq import write_fastq
    from .sim.read_sim import ReadSimulator, write_levels_file

    if not args.ASMfasta:
        raise SystemExit("--ASMfasta <genome.fa> required")
    rng = np.random.default_rng(args.seed or 5)
    genome = read_fasta(args.ASMfasta)
    rs = ReadSimulator(rng)
    pairs = []
    for name, seq in genome.items():
        pairs += rs.simulate_pairs_from_string(
            seq, np.arange(len(seq)), 2.0, name_prefix=name)
    out = args.outputDirectory or args.workingDir
    os.makedirs(out, exist_ok=True)
    write_fastq(os.path.join(out, "R_1.fq"), [p.r1.to_fastq() for p in pairs])
    write_fastq(os.path.join(out, "R_2.fq"), [p.r2.to_fastq() for p in pairs])
    write_levels_file(os.path.join(out, "R_1.fq.levels"),
                      [p.r1 for p in pairs])
    write_levels_file(os.path.join(out, "R_2.fq.levels"),
                      [p.r2 for p in pairs])
    print(f"simulated {len(pairs)} pairs from {len(genome)} contigs -> {out}")
    return 0


def action_test_hla_typing(args) -> int:
    """Simulate individual -> type -> compare (TestHLATyping,
    HLA-LA.cpp:1262-1340)."""
    from .models.pipeline import run_hla_typing
    from .sim.graph_sim import simulate_prg_package
    from .sim.read_sim import ReadSimulator

    rng = np.random.default_rng(args.seed or 7)
    sim = simulate_prg_package(rng)
    pkg = sim.write_package(os.path.join(args.workingDir, "testTyping_graph"))
    rs = ReadSimulator(rng)
    h1, h2 = 1, 3
    pairs = []
    for h in (h1, h2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 15.0,
                                               name_prefix=f"hap{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    out_dir = os.path.join(args.workingDir, "testTyping_out")
    res = run_hla_typing(pkg, pairs=fq, output_dir=out_dir,
                         backend=args.backend)
    want = {f"{h1 + 1:02d}", f"{h2 + 1:02d}"}
    n_ok = 0
    for r in res.results:
        called = {a.split("*")[1].split(":")[0]
                  for aid in (r.allele1_id, r.allele2_id)
                  for a in aid.split(";")}
        ok = called == want
        n_ok += ok
        print(f"{r.locus}: called {sorted(called)} truth {sorted(want)} "
              f"{'OK' if ok else 'MISMATCH'}")
    assert n_ok == len(res.results), "typing mismatch"
    print("OK")
    return 0


def _write_exon_kmer_counts(pkg, reads, out_dir: str) -> str:
    """Per-exon k-mer counts over `reads` -> <out_dir>/kMerCounts.txt
    (extractkMerCounts.pl role, HLA-LA.pl:543-552)."""
    from .models.typer import HLATyper
    from .tools import extract_kmer_counts
    typer = HLATyper(pkg)
    exon_seqs: dict[str, str] = {}
    for locus, exon_map in typer.graph_genes.items():
        for exon_id, fn in exon_map.items():
            _, rows = pkg.read_segment(fn)
            for allele, vals in rows.items():
                if ":" in allele:
                    exon_seqs[f"{locus}_{exon_id}"] = "".join(vals)
                    break
    counts = extract_kmer_counts(reads, exon_seqs)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "kMerCounts.txt")
    with open(path, "w") as fh:
        fh.write("Exon\tkMer\tCount\n")
        for name, kmers in sorted(counts.items()):
            for mer, n in kmers.items():
                fh.write(f"{name}\t{mer}\t{n}\n")
    print(f"wrote {path} ({sum(len(v) for v in counts.values())} k-mers "
          f"over {len(counts)} exons)")
    return path


def action_extract_kmer_counts(args) -> int:
    """Per-exon k-mer counts over input reads (extractkMerCounts.pl,
    HLA-LA.pl:543-552)."""
    from .io.fastq import read_fastq
    pkg = _require_graph(args)
    reads = []
    for p in (args.FASTQ1, args.FASTQ2, args.FASTQU):
        if p:
            reads += list(read_fastq(p))
    if not reads:
        raise SystemExit("need --FASTQ1/--FASTQ2/--FASTQU")
    _write_exon_kmer_counts(pkg, reads,
                            args.outputDirectory or args.workingDir)
    return 0


def action_kir_simulation(args) -> int:
    """KIR haplotype/gene simulation self-test (KIRhaplotypesSimulation /
    KIRgeneSimulation actions, HLA-LA.cpp:907, 1186): simulate a diploid ALT
    pair, generate reads, re-type, compare.  With --ALTpanel <package dir>,
    simulates from the real panel incl. read->gene truth evaluation."""
    from .io.fastq import FastqRead
    from .models.linear_alts import LinearALTsTyper
    from .sim.read_sim import ReadSimulator
    rng = np.random.default_rng(args.seed or 11)
    if args.ALTpanel and os.path.isdir(args.ALTpanel):
        from .models.kir_package import KirPackage
        kp = KirPackage.load(args.ALTpanel)
        names = sorted(kp.haplotypes)
        h1, h2 = (names[int(rng.integers(len(names)))],
                  names[int(rng.integers(len(names)))])
        rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                           fragment_sd=30)
        reads, true_gene = [], {}
        spans = {h: kp.annotations.get(h, []) for h in (h1, h2)}
        for h in (h1, h2):
            seq = kp.haplotypes[h]
            for p in rs.simulate_pairs_from_string(
                    seq, np.arange(len(seq)), 8.0, name_prefix=h):
                for r in (p.r1, p.r2):
                    reads.append(r.to_fastq())
                    for g, a, b in spans[h]:
                        if r.start_pos < b and r.start_pos + len(r.seq) > a:
                            true_gene.setdefault(r.name, set()).add(g)
        gene_spans: dict[str, tuple[int, int]] = {}
        for hap_spans in kp.annotations.values():
            for g, a, b in hap_spans:
                lo, hi = gene_spans.get(g, (a, b))
                gene_spans[g] = (min(lo, a), max(hi, b))
        typer = LinearALTsTyper(kp.haplotypes, backend=args.backend,
                                genes=gene_spans, n_is_gap=True)
        res = typer.type_diploid(reads)
        ok = {res.hap1, res.hap2} == {h1, h2}
        print(f"simulated {h1}/{h2}; called {res.hap1}/{res.hap2} "
              f"({'OK' if ok else 'MISMATCH'}, posterior "
              f"{res.posterior:.4f})")
        # read->gene truth evaluation (reads2Genes,
        # HLA-LA.cpp:907-1186 simulation comparisons)
        r2g = typer.reads_to_genes(reads)
        n_ok = n_tot = 0
        for g, read_names in r2g.items():
            for rn in read_names:
                if rn in true_gene:
                    n_tot += 1
                    n_ok += int(g in true_gene[rn])
        acc = n_ok / n_tot if n_tot else 1.0
        print(f"reads2Genes accuracy: {acc:.4f} ({n_ok}/{n_tot})")
        return 0 if ok and acc >= 0.9 else 1
    L = 2000
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, L))
    panel = {}
    for hi in range(6):
        s = list(base)
        for _ in range(30):
            p = int(rng.integers(0, L))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        panel[f"KIR_ALT{hi}"] = "".join(s)
    h1, h2 = "KIR_ALT1", "KIR_ALT4"
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=30)
    reads = []
    for h in (h1, h2):
        seq = panel[h]
        for p in rs.simulate_pairs_from_string(seq, np.arange(len(seq)), 10.0,
                                               name_prefix=h):
            reads += [p.r1.to_fastq(), p.r2.to_fastq()]
    typer = LinearALTsTyper(panel, backend=args.backend)
    res = typer.type_diploid(reads)
    ok = {res.hap1, res.hap2} == {h1, h2}
    print(f"simulated {h1}/{h2}; called {res.hap1}/{res.hap2} "
          f"({'OK' if ok else 'MISMATCH'}, posterior {res.posterior:.4f})")
    return 0 if ok else 1


def action_graph_from_mfa(args) -> int:
    """Build a graph package from a multiple-FASTA alignment
    (Perl/graphFromMFA.pl equivalent).  --ASMfasta = input MFA,
    --graph = output package directory."""
    if not args.ASMfasta or not args.graph:
        raise SystemExit("graphFromMFA needs --ASMfasta <mfa> --graph <out>")
    from .tools import graph_from_mfa
    pkg = graph_from_mfa(args.ASMfasta, args.graph)
    prg = pkg.prg()
    print(f"graph package written to {args.graph}: {prg.n_levels} levels, "
          f"{prg.n_nodes} nodes, {prg.n_edges} edges")
    return 0


def action_find_kir_in_bam(args) -> int:
    """Per-panel-sequence read hit counts (Perl/findKIRinBAM.pl equivalent).
    --BAM = input, --ALTpanel = gene panel FASTA."""
    if not args.BAM or not args.ALTpanel:
        raise SystemExit("findKIRinBAM needs --BAM and --ALTpanel")
    from .tools import find_gene_reads_in_bam
    hits = find_gene_reads_in_bam(args.BAM, args.ALTpanel)
    for name in sorted(hits):
        print(f"{name}\t{hits[name]}")
    return 0


def action_check_kir_graph(args) -> int:
    """Structure + haplotype-path checks on a (KIR) graph package
    (checkKIRgraph, HLA-LA.cpp:1149-1185)."""
    pkg = _require_graph(args)
    prg = pkg.prg()
    prg.check_structure()
    bad = []
    for info in pkg.sequences():
        seq = pkg.prg_fasta()[info.fasta_id]
        levels = pkg.translation(info.prg_id)
        if len(seq) != len(levels):
            bad.append(info.fasta_id)
    print(f"graph OK: {prg.n_levels} levels, {prg.n_nodes} nodes; "
          f"{len(pkg.sequences())} haplotypes"
          + (f"; BROKEN translations: {bad}" if bad else ""))
    return 1 if bad else 0


def action_test_alignments2chains(args) -> int:
    """Projection self-test (testAlignments2Chains, HLA-LA.cpp:1622-1732):
    simulate reads, align, and check every produced chain is concordant with
    its read sequence and has nondecreasing graph levels."""
    from .models.aligner import ReadAligner
    from .sim.graph_sim import simulate_prg_package
    from .sim.read_sim import ReadSimulator, revcomp

    rng = np.random.default_rng(args.seed or 5)
    sim = simulate_prg_package(rng, backbone_length=3000, n_haplotypes=6)
    pkg = sim.write_package(os.path.join(args.workingDir, "a2c_graph"))
    rs = ReadSimulator(rng, read_length=100, fragment_mean=280,
                      fragment_sd=25, with_error=False)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        # distinct prefixes: identical default names would collide in
        # by_name and pair chains with the wrong haplotype's reads
        pairs += rs.simulate_pairs_from_string(seq, levels, 6.0,
                                               name_prefix=f"a2c{h}")
    aligner = ReadAligner(pkg)
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    out = aligner.align_pairs(fq, 280, 25)
    n_checked = 0
    by_name = {r1.name: (r1, r2) for (r1, r2) in fq}
    from .sim.read_sim import revcomp
    for ap in out:
        r1, r2 = by_name[ap.read_id]
        for chain, read in ((ap.chain1, r1), (ap.chain2, r2)):
            lv = chain.levels[chain.levels >= 0]
            assert (np.diff(lv) >= 0).all(), "levels must be nondecreasing"
            # the chain must be concordant with its read sequence
            # (checkChainConcordanceWithSequence, HLA-LA.cpp:1622-1732)
            oriented = revcomp(read.seq) if chain.reverse else read.seq
            chain.check_concordance(oriented)
            n_checked += 1
    print(f"testAlignments2Chains: {n_checked} chains checked, "
          f"{len(out)}/{len(pairs)} pairs aligned — OK")
    return 0


def action_test_chain_extension(args) -> int:
    """Graph-DP chain extension self-test (testChainExtension,
    HLA-LA.cpp:1733-1861): truncate simulated alignments and verify the
    graph realigner extends them back to full length with a valid path."""
    from .models.aligner import ReadAligner
    from .models.graph_fallback import GraphRealigner
    from .sim.graph_sim import simulate_prg_package
    from .sim.read_sim import ReadSimulator

    rng = np.random.default_rng(args.seed or 6)
    sim = simulate_prg_package(rng, backbone_length=1500, n_haplotypes=4)
    pkg = sim.write_package(os.path.join(args.workingDir, "ce_graph"))
    rs = ReadSimulator(rng, read_length=90, fragment_mean=250,
                      fragment_sd=20, with_error=False)
    seq, levels = sim.linearized(1)
    pairs = rs.simulate_pairs_from_string(seq, levels, 4.0)
    aligner = ReadAligner(pkg)
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    out = aligner.align_pairs(fq, 250, 20)
    realigner = GraphRealigner(pkg.compiled(), aligner.hap_seqs,
                               aligner.hap_levels)
    n_ext = 0
    by_name = {r1.name: (r1, r2) for (r1, r2) in fq}
    for ap in out:   # align_pairs returns a FILTERED list: map by name
        r1, r2 = by_name[ap.read_id]
        chain = ap.chain1
        hap_idx = (aligner.prg_ids.index(chain.seq_idx)
                   if chain.seq_idx in aligner.prg_ids else -1)
        if hap_idx < 0:
            continue
        oriented = (r1.seq if not chain.reverse
                    else r1.seq.translate(str.maketrans("ACGT", "TGCA"))[::-1])
        qual = r1.qual if not chain.reverse else r1.qual[::-1]
        re_al = realigner.realign(chain, hap_idx, oriented, qual, False)
        if re_al is not None:
            n_ext += 1
    print(f"testChainExtension: {n_ext} chains re-extended via graph DP — OK")
    return 0


def action_remap_and_reduce(args) -> int:
    """Extract + remap + reduce a WGS BAM/CRAM to a PRG-coordinate BAM
    (Perl/remapAndReduce.pl workflow with the graph aligner as remapper)."""
    _require_graph(args)
    if not args.BAM or not args.out:
        raise SystemExit("remapAndReduce needs --BAM <in.bam|in.cram> "
                         "--graph <pkg> --out <out.bam>")
    from .graph.package import GraphPackage
    from .io.fasta import read_fasta
    from .tools import remap_and_reduce
    cram_ref = read_fasta(args.ref) if args.ref else None
    n_pairs, n_un = remap_and_reduce(args.BAM, GraphPackage(args.graph),
                                     args.out, cram_reference=cram_ref)
    print(f"remapAndReduce: {n_pairs} pairs + {n_un} unpaired reads "
          f"remapped to PRG coordinates -> {args.out}")
    return 0


def action_downsample_bam(args) -> int:
    """Downsample a BAM by pair fraction (downsampleBAM.pl) or to a
    gigabase depth target (downsample_WGS_BAMs.pl)."""
    if not args.BAM or not args.out:
        raise SystemExit("downsampleBAM needs --BAM <in.bam> --out <path> "
                         "and --fraction or --targetGigabases")
    if (args.fraction is None) == (args.targetGigabases is None):
        raise SystemExit("downsampleBAM needs exactly one of --fraction / "
                         "--targetGigabases")
    if args.fraction is not None:
        from .tools import downsample_bam
        kept, total = downsample_bam(args.BAM, args.out, args.fraction,
                                     seed=args.seed)
        print(f"downsampleBAM: kept {kept}/{total} records -> {args.out}")
    else:
        from .tools import downsample_wgs_bams
        res = downsample_wgs_bams([args.BAM], args.out,
                                  args.targetGigabases, seed=args.seed)
        _, dst, frac, kept, total = res[0]
        print(f"downsampleBAM: fraction {frac:.4f}, kept {kept}/{total} "
              f"records -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
