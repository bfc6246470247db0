#!/bin/bash
# Build the REFERENCE linemodLevelup matching core (meiqua/6DPose) against
# OpenCV 4, with the Open3D-only poseRefine::process stubbed out, plus our
# ref_driver.cpp harness.  The patched reference source is generated into the
# (gitignored) build directory — it is a benchmarking artifact, never shipped.
#
# Usage: refbaseline/build_reference.sh [build_dir]
set -euo pipefail
REF=/root/reference/linemodLevelup
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="${1:-$HERE/build}"
mkdir -p "$BUILD"

python3 - "$REF/linemodLevelup.cpp" "$BUILD/linemodLevelup_patched.cpp" <<'EOF'
import re, sys
src, dst = sys.argv[1], sys.argv[2]
text = open(src).read()

# 1. Drop the Open3D include (only poseRefine::process uses it).
text = text.replace('#include "Open3D/Open3D.h"\n', '')

# 2. Drop the Eigen-based eigen2cv helper (Eigen came in via Open3D; the
#    helper is only used inside poseRefine::process).
m = re.search(r'template<typename _Tp.*?\n}\n', text, re.S)
assert m, 'eigen2cv helper not found'
text = text[:m.start()] + text[m.end():]

# 3. Stub poseRefine::process (Open3D ICP).  The matching core — the thing
#    we are baselining — does not touch it.
m = re.search(r'void poseRefine::process\(.*?\n}\n', text, re.S)
assert m, 'poseRefine::process not found'
stub = (
    'void poseRefine::process(Mat &sceneDepth, Mat &modelDepth, Mat &sceneK,'
    ' Mat &modelK,\n'
    '                        Mat &modelR, Mat &modelT, int detectX, int detectY)\n'
    '{\n'
    '    // Open3D unavailable in this environment: ICP stubbed out for the\n'
    '    // matching-stage baseline.  residual stays -1 (the reference\'s own\n'
    '    // failure contract).\n'
    '    (void)sceneDepth; (void)modelDepth; (void)sceneK; (void)modelK;\n'
    '    (void)modelR; (void)modelT; (void)detectX; (void)detectY;\n'
    '    residual = -1;\n'
    '}\n'
)
text = text[:m.start()] + stub + text[m.end():]

open(dst, 'w').write(text)
print(f'patched -> {dst}')
EOF

CXXFLAGS="-O3 -std=c++14 -march=native -I$REF $(pkg-config --cflags opencv4)"
LIBS="$(pkg-config --libs opencv4)"

g++ $CXXFLAGS -c "$BUILD/linemodLevelup_patched.cpp" -o "$BUILD/linemodLevelup.o"
g++ $CXXFLAGS -c "$HERE/ref_driver.cpp" -o "$BUILD/ref_driver.o"
g++ "$BUILD/linemodLevelup.o" "$BUILD/ref_driver.o" -o "$BUILD/ref_driver" $LIBS
echo "built $BUILD/ref_driver"
