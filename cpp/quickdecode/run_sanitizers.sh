#!/usr/bin/env bash
# Race/memory sanitizer sweep for the native decode engine — the QA gap the
# reference leaves open (no TSAN/ASAN anywhere, SURVEY.md section 5.2).
# Builds the library under ThreadSanitizer and AddressSanitizer and runs the
# decoder test suite against each.
set -euo pipefail
cd "$(dirname "$0")"

run_suite() {
  local lib="$1"; shift
  local preload="$1"; shift
  echo "=== suite with $lib ==="
  QUICKDECODE_LIB="$PWD/$lib" LD_PRELOAD="$preload" \
    python -m pytest ../../tests/test_quickdecode.py -q
}

make tsan
# TSAN needs its runtime preloaded when the instrumented code is a dlopen'd
# library under an uninstrumented python
TSAN_RT=$(g++ -print-file-name=libtsan.so)
run_suite libquickdecode_tsan.so "$TSAN_RT"

make asan
ASAN_RT=$(g++ -print-file-name=libasan.so)
ASAN_OPTIONS=detect_leaks=0 run_suite libquickdecode_asan.so "$ASAN_RT"

echo "sanitizer sweep OK"
