#!/bin/sh
# Compile the ACTUAL reference library (read-only mount at
# /root/reference) against the Eigen bundled with this image's
# tensorflow wheel, run it, and refresh the captured ground truth used
# by tests/test_reference_binary.py.
set -e
cd "$(dirname "$0")"
EIGEN=$(/opt/venv/bin/python - << 'PY'
import pathlib, tensorflow
print(pathlib.Path(tensorflow.__file__).parent / "include")
PY
)
# Write each capture to a temp file and move it into place only on
# success: a compile/runtime failure must not truncate the checked-in
# ground truth the test suite parses.
g++ -O2 -std=c++17 -I/root/reference/include -I"$EIGEN" \
    ref_driver.cpp -o /tmp/ref_driver
/tmp/ref_driver > reference_ground_truth.json.tmp
mv reference_ground_truth.json.tmp reference_ground_truth.json
echo "wrote $(pwd)/reference_ground_truth.json"
g++ -O2 -std=c++17 -I/root/reference/include -I"$EIGEN" \
    ref_fuzz.cpp -o /tmp/ref_fuzz
/tmp/ref_fuzz > reference_fuzz.json.tmp
mv reference_fuzz.json.tmp reference_fuzz.json
echo "wrote $(pwd)/reference_fuzz.json"
g++ -O2 -std=c++17 -DF32_MAIN -I/root/reference/include -I"$EIGEN" \
    ref_fuzz.cpp -o /tmp/ref_fuzz_f32
/tmp/ref_fuzz_f32 > reference_fuzz_f32.json.tmp
mv reference_fuzz_f32.json.tmp reference_fuzz_f32.json
echo "wrote $(pwd)/reference_fuzz_f32.json"
# timing is a point-in-time, host-specific capture (not test-compared)
g++ -O2 -std=c++17 -I/root/reference/include -I"$EIGEN" \
    ref_timing.cpp -o /tmp/ref_timing
/tmp/ref_timing > reference_timing.json.tmp
mv reference_timing.json.tmp reference_timing.json
echo "wrote $(pwd)/reference_timing.json"
