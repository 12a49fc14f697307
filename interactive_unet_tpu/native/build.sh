#!/bin/sh
# Build the native host runtime: libiunet.so
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libiunet.so src/iunet_native.cpp -lzstd -lz -lpthread
echo "built $(pwd)/libiunet.so"
