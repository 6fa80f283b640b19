#!/bin/sh
# Build libposendf_io.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    -o libposendf_io.so posendf_io.cc
echo "built $(pwd)/libposendf_io.so"
