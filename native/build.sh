#!/usr/bin/env bash
# Build the native host ops into native/libhostops.so.
#
# Compile to a temp file and rename into place: long-running pipeline
# processes keep the old .so mmapped, and overwriting the mapped inode
# in place would corrupt their text pages. rename() gives them the old
# inode until exit while new processes pick up the new build.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
TMP="$HERE/.libhostops.so.tmp.$$"
trap 'rm -f "$TMP"' EXIT
g++ -O3 -march=native -fopenmp -shared -fPIC \
    -o "$TMP" "$HERE/host_ops.cpp"
mv -f "$TMP" "$HERE/libhostops.so"
echo "built $HERE/libhostops.so"
