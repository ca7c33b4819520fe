#!/bin/bash
# Build the native host-side geometry library (ctypes, no pybind11).
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -ffast-math -shared -fPIC \
    -o native/libafocus.so native/afocus_native.cpp
echo "built native/libafocus.so"
