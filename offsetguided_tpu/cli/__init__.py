"""Command-line entry points (installed as ``og-*`` console scripts).

Each module here is a complete tool mirroring one of the reference repo's
top-level scripts (train_dist.py, evaluate.py, demo_batch.py,
utils/simulate.py); ``tools/*.py`` at the repo root are thin shims kept for
running from a source checkout without installing.
"""
