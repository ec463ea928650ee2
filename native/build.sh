#!/bin/sh
# Build the native host-side preprocessing library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libregtr_native.so src/regtr_native.cpp
echo "built $(pwd)/libregtr_native.so"
