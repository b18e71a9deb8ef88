"""Native (C++) components, shipped as source and built on first use.

`rle.cpp` is the COCO RLE mask codec (ctypes-loaded by data/native.py, with
a pure-Python fallback in data/coco.py when no toolchain exists).
"""
