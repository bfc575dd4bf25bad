#!/bin/bash
# One-shot local gate: compile, tests, oracle parity at sf0.01, bench at sf0.1.
set -e
cd "$(dirname "$0")/.."
echo "== compile =="; sbt -batch compile | grep -E "success|error"
echo "== tests ==";   sbt -batch test 2>&1 | grep -E "Tests:|Passed: Total|FAILED"
echo "== verify sf0.01 =="
rm -rf /tmp/graft_vout
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_vout" 2>&1 | grep "\[verify\]" || true
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_vout
echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
