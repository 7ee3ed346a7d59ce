"""`python -m hla_la_tpu` == the CLI (same entry as the hla-la-tpu
console script in pyproject.toml)."""

import sys

from .cli import main

sys.exit(main(sys.argv[1:]))
