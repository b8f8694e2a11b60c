"""Root entry shim (reference parity: main.py dispatching --train /
--convert). Prefer `python -m sparsernns_tpu.cli <command>`."""

import sys

from sparsernns_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
