#!/bin/bash
# Build the reference THUNDER binary in place against minimpi (a real
# 3-process MPI subset, native/minimpi) so the reference's full E-M can
# run in-image for E2E parity (VERDICT round-2 item #2).
#
# Nothing is copied out of /root/reference: its sources are compiled
# where they lie; vendored FFTW(float)+GSL are configured out-of-tree.
#
# Outputs (all under /root/repo/.ref_build, gitignored):
#   deps/            fftw3f + gsl installs
#   obj/             reference object files
#   thunder_ref      the reference E-M binary (appsrc/thunder.cpp)
#   dump_goldens     round-2 goldens harness, now linked to minimpi
set -euo pipefail

REPO=/root/repo
REF=/root/reference
BUILD=$REPO/.ref_build
DEP=$BUILD/deps
OBJ=$BUILD/obj
JOBS=$(nproc)

mkdir -p "$BUILD" "$DEP" "$OBJ"

# ---- vendored deps ----------------------------------------------------
if [ ! -f "$DEP/lib/libfftw3f.a" ]; then
    echo "== building vendored FFTW (float, threads) =="
    mkdir -p "$BUILD/fftw" && cd "$BUILD/fftw"
    "$REF/external/packages/fftw-3.3.7/configure" --prefix="$DEP" \
        --enable-float --enable-threads --disable-fortran --quiet
    make -j"$JOBS" MAKEINFO=true >/dev/null
    make install MAKEINFO=true >/dev/null
fi
if [ ! -f "$DEP/lib/libgsl.a" ]; then
    echo "== building vendored GSL =="
    mkdir -p "$BUILD/gsl" && cd "$BUILD/gsl"
    "$REF/external/packages/gsl-2.4/configure" --prefix="$DEP" --quiet
    make -j"$JOBS" >/dev/null 2>&1
    make install >/dev/null 2>&1
fi

# ---- reference objects ------------------------------------------------
INC="-I $REPO/native/minimpi \
     -I $REPO/native/ref_harness/shims \
     -I $REF/include -I $REF/include/Functions -I $REF/include/Geometry \
     -I $REF/include/Image \
     -I $REF/external/Eigen3 -I $REF/external/easylogging \
     -I $REF/external/jsoncpp \
     -I $DEP/include"
FLAGS="-O2 -std=c++14 -fopenmp -w -DELPP_THREAD_SAFE -DNDEBUG"

cd "$OBJ"
echo "== compiling reference sources =="
SRCS=$(find "$REF/src" -name '*.cpp')
SRCS="$SRCS $(find "$REF/external/easylogging" -name '*.cc' 2>/dev/null || true)"
SRCS="$SRCS $(find "$REF/external/jsoncpp" -name '*.cpp' 2>/dev/null || true)"
for f in $SRCS; do
    o="$OBJ/$(echo "$f" | tr '/.' '__').o"
    if [ ! -f "$o" ] || [ "$f" -nt "$o" ]; then
        echo "  CXX $(basename "$f")"
        g++ $FLAGS $INC -c "$f" -o "$o" &
        while [ "$(jobs -r | wc -l)" -ge "$JOBS" ]; do wait -n; done
    fi
done
wait
gcc -O2 -c "$REPO/native/minimpi/minimpi.c" -o "$OBJ/minimpi.o"

LIBS="$DEP/lib/libfftw3f_threads.a $DEP/lib/libfftw3f.a \
      $DEP/lib/libgsl.a $DEP/lib/libgslcblas.a -lgomp -lpthread -lm"

echo "== linking thunder_ref =="
g++ $FLAGS $INC "$REF/appsrc/thunder.cpp" $OBJ/*.o -o "$BUILD/thunder_ref" $LIBS

echo "== linking dump_goldens (minimpi single-rank) =="
g++ $FLAGS $INC "$REPO/native/ref_harness/dump_goldens.cpp" $OBJ/*.o \
    -o "$BUILD/dump_goldens" $LIBS || echo "(dump_goldens link skipped)"

echo "build_ref.sh: done -> $BUILD/thunder_ref"
