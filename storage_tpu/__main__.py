"""``python -m storage_tpu`` — the CLI front-end (see storage_tpu/cli.py)."""
import sys

from .cli import main

sys.exit(main())
