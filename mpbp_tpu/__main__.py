"""`python -m mpbp_tpu` — CLI entry (see mpbp_tpu/cli.py)."""

import sys

from mpbp_tpu.cli import main

sys.exit(main())
