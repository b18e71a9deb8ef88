#!/usr/bin/env python
"""Shim for a source checkout; the implementation lives in
offsetguided_tpu.cli.bench_warp (installed as a console script)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from offsetguided_tpu.cli.bench_warp import *  # noqa: F401,F403
from offsetguided_tpu.cli.bench_warp import main  # noqa: F401

if __name__ == "__main__":
    sys.exit(main())
