#!/bin/sh
# Build the native depth-IO library (libpng + pthreads, C ABI for ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o liblsf_io.so depth_io.cpp -lpng -lz -lpthread
echo "built $(pwd)/liblsf_io.so"
