#!/bin/sh
# Build libposendf_io.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    -o libposendf_io.so posendf_io.cc
# Mirror the library into the package dir so wheel builds pick it up via
# [tool.setuptools.package-data] (posendf_tpu = ["*.so"]); the loader
# searches both locations (posendf_tpu/data/native.py::_lib_path).
cp -f libposendf_io.so ../posendf_tpu/libposendf_io.so
echo "built $(pwd)/libposendf_io.so (+ copy in posendf_tpu/)"
