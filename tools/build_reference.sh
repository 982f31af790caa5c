#!/usr/bin/env bash
# Build the reference `ria` CLI (and cli_simulator) out-of-tree for interop testing.
#
# The reference CMakeLists references a tests/ dir that is absent from the
# distribution (CMakeLists.txt:339-342), so tests are switched OFF; the GUI
# needs SDL2 which is not in this image, so it is OFF too.  Tools (notably
# cli_simulator) and the `ria` CLI build fine.
#
# Usage: tools/build_reference.sh [build_dir]
set -euo pipefail
REF=${REF:-/root/reference}
BUILD=${1:-/root/repo/build_ref}
cmake -S "$REF" -B "$BUILD" -G Ninja \
  -DCMAKE_BUILD_TYPE=Release \
  -DULTRA_BUILD_TESTS=OFF \
  -DULTRA_BUILD_GUI=OFF \
  -DULTRA_BUILD_TOOLS=ON \
  -DULTRA_USE_FFTW=OFF \
  -DULTRA_ENABLE_HAMLIB=OFF >/dev/null
cmake --build "$BUILD" -j"$(nproc)" --target ria cli_simulator 2>&1 | tail -3
echo "ria binary: $BUILD/ria"
