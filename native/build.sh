#!/bin/sh
# Build the native mask utilities into librle.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o librle.so rle.cpp
echo "built $(pwd)/librle.so"
