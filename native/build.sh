#!/usr/bin/env bash
# Build the native host ops into native/libhostops.so.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
g++ -O3 -march=native -fopenmp -shared -fPIC \
    -o "$HERE/libhostops.so" "$HERE/host_ops.cpp"
echo "built $HERE/libhostops.so"
