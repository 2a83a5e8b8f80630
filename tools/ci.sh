#!/bin/sh
# One-shot verification: unit+e2e tests, full oracle gate at two SFs,
# plan-shape audit. Mirrors what the external driver and judge check.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/oracle_check.py /root/testdata/sf0.001
python tools/oracle_check.py /root/testdata/sf0.01
python tools/plan_audit.py
# The committed fingerprint baseline must describe the committed code:
# recert --check exits 1 if any query's plan/oracle/source fingerprint
# drifted since plan_hashes.json was last regenerated (regenerate it as
# the LAST step before a snapshot commit).
python tools/recert.py --check
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py 2>/dev/null | tail -1
