#!/bin/sh
# Build the native data-plane library. Output: native/libcris_data.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC batch_preprocess.cc -o libcris_data.so \
    $(pkg-config --cflags opencv4) \
    -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lpthread
echo "built $(pwd)/libcris_data.so"
