#!/bin/bash
# Build the native data loader: libwaedata.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o libwaedata.so dataload.cpp
echo "built $(pwd)/libwaedata.so"
