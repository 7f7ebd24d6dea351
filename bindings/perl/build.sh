#!/bin/bash
# Build the Perl XS binding: xsubpp translates the .xs, gcc compiles it
# against the perl core headers and links libwhisper_tpu.so.
set -euo pipefail
cd "$(dirname "$0")"

ROOT="$(cd ../.. && pwd)"
ARCHLIB="$(perl -MConfig -e 'print $Config{archlib}')"
CCFLAGS="$(perl -MConfig -e 'print $Config{ccflags}')"

[ -f "$ROOT/native/libwhisper_tpu.so" ] || make -C "$ROOT/native" libwhisper_tpu.so

xsubpp -typemap "$(perl -MConfig -e 'print $Config{privlib}')/ExtUtils/typemap" \
    WhisperTPU.xs > WhisperTPU.c

# shellcheck disable=SC2086
gcc -O2 -fPIC -shared $CCFLAGS \
    -I"$ARCHLIB/CORE" -I"$ROOT/native" \
    WhisperTPU.c -o WhisperTPU.so \
    -L"$ROOT/native" -lwhisper_tpu

echo "built bindings/perl/WhisperTPU.so"
