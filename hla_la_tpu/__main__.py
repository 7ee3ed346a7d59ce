"""`python -m hla_la_tpu` == the CLI (same entry as the hla-la-tpu
console script in pyproject.toml)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
