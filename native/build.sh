#!/bin/sh
# Build libgroove_native.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -pthread groove_native.cpp -o libgroove_native.so
echo "built $(pwd)/libgroove_native.so"
