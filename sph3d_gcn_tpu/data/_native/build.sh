#!/bin/sh
# Build the native data-loader core (counterpart of the reference's
# per-op compile.sh nvcc/g++ build, ref /root/reference/compile.sh).
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC loader.cc -o libsph3dloader.so
echo "built $(pwd)/libsph3dloader.so"
