#!/bin/sh
# One-shot verification: unit+e2e tests, full oracle gate at two SFs,
# plan-shape audit. Mirrors what the external driver and judge check.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/oracle_check.py /root/testdata/sf0.001
python tools/oracle_check.py /root/testdata/sf0.01
python tools/plan_audit.py
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py 2>/dev/null | tail -1
