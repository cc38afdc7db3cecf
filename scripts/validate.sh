#!/bin/bash
# One-shot validation: unit+property tests, full oracle selfcheck at two
# scale factors, bench, and plan-audit regeneration.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle selfcheck sf0.01 =="
python scripts/selfcheck.py /root/testdata/sf0.01 2>/dev/null | tail -1
echo "== oracle selfcheck sf0.001 =="
python scripts/selfcheck.py /root/testdata/sf0.001 2>/dev/null | tail -1
echo "== bench sf0.1 =="
python bench.py 2>/dev/null
echo "== plan audit =="
python scripts/explain_audit.py 2>/dev/null
