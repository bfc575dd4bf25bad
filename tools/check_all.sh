#!/bin/bash
# One-shot local gate: compile, tests, oracle parity at sf0.01, bench at sf0.1.
set -e
cd "$(dirname "$0")/.."
echo "== compile =="; sbt -batch compile | grep -E "success|error"
echo "== tests ==";   sbt -batch test 2>&1 | grep -E "Tests:|Passed: Total|FAILED"
echo "== verify sf0.01 =="
# Verify sizes its own concurrency from driver heap vs input size (the
# 10x-OOM lesson turned into code — see Verify.scala); for inputs past
# sf0.1 set SPARK_DRIVER_MEM (e.g. 64g) to get 4-way concurrency back,
# or let it degrade toward serial on the default 8g heap.
rm -rf /tmp/graft_vout
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_vout" 2>&1 | grep "\[verify\]" || true
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_vout
echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
