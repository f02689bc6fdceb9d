#!/bin/sh
# Build the native host-tier extension in place.
set -e
cd "$(dirname "$0")"
PY_INC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
NP_INC=$(python -c "import numpy; print(numpy.get_include())")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O3 -march=native -shared -fPIC \
    -I"$PY_INC" -I"$NP_INC" \
    voxelgrid.cpp -o "_lrg_native$EXT"
echo "built _lrg_native$EXT"
