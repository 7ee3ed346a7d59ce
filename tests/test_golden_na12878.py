"""NA12878 golden-output conformance (reference README.md:119-130: all
G-group calls must agree with NA12878_example_output_G.txt, Q1 == 1).

This is the reference's strongest end-to-end test.  It needs the real
PRG_MHC_GRCh38_withIMGT graph package (~2.3 GB) and the NA12878 mini
BAM/CRAM — neither ships with the repo.  Point the env vars at local
copies to run:

    HLA_LA_GRAPH_DIR=/path/to/PRG_MHC_GRCh38_withIMGT \
    HLA_LA_NA12878_BAM=/path/to/NA12878.mini.cram   (BAM or CRAM) \
    HLA_LA_REF=/path/to/GRCh38.fa   (only needed for CRAM input) \
    python -m pytest tests/test_golden_na12878.py -v

The golden table defaults to the copy shipped inside the reference mount
(/root/reference/NA12878_example_output_G.txt); override with
HLA_LA_GOLDEN.
"""

import os

import pytest

GRAPH = os.environ.get("HLA_LA_GRAPH_DIR")
BAM = os.environ.get("HLA_LA_NA12878_BAM")
GOLDEN = os.environ.get(
    "HLA_LA_GOLDEN", "/root/reference/NA12878_example_output_G.txt")
REF_FA = os.environ.get("HLA_LA_REF")

pytestmark = pytest.mark.skipif(
    not (GRAPH and BAM and GOLDEN and os.path.isdir(GRAPH)
         and os.path.exists(BAM) and os.path.exists(GOLDEN)),
    reason="real NA12878 data not available (set HLA_LA_GRAPH_DIR, "
           "HLA_LA_NA12878_BAM[, HLA_LA_REF for CRAM])")


def test_na12878_g_group_concordance(tmp_path):
    from hla_la_tpu.cli import main
    from hla_la_tpu.utils.nomenclature import golden_g_mismatches

    out_dir = str(tmp_path / "NA12878")
    argv = ["--action", "HLA", "--BAM", BAM, "--graph", GRAPH,
            "--sampleID", "NA12878", "--workingDir", str(tmp_path),
            "--outputDirectory", out_dir, "--maxThreads", "4"]
    if REF_FA:
        argv += ["--ref", REF_FA]
    rc = main(argv)
    assert rc == 0

    # the comparison itself is shared with the in-suite dress rehearsal
    # (tests/test_golden_rehearsal.py), which executes it every run
    mismatches = golden_g_mismatches(
        GOLDEN, os.path.join(out_dir, "hla", "R1_bestguess_G.txt"))
    assert not mismatches, f"G-group call mismatches: {mismatches}"
