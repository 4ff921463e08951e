#!/bin/sh
# The whole verification battery, one command, exit 0 == healthy.
# (scale sweep excluded: rebuild the replica first, see tools/make_replica.py)
set -e
cd "$(dirname "$0")/.."
python tools/check_oracle.py
python -m pytest tests/ -q
python tools/plan_lint.py
python tools/check_coverage.py
python tools/check_dtypes.py
