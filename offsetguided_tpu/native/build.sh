#!/bin/sh
# Build the native mask utilities into librle.so next to this script.
# (data/native.py also auto-builds on first use, falling back to a per-user
# cache dir when this directory is not writable, e.g. installed packages.)
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o librle.so rle.cpp
echo "built $(pwd)/librle.so"
