#!/bin/sh
# The whole verification battery, one command, exit 0 == healthy.
set -e
cd "$(dirname "$0")/.."
python tools/check_oracle.py
python -m pytest tests/ -q
python tools/plan_lint.py
python tools/check_coverage.py
python tools/check_dtypes.py
# 10x duplicated-values replica sweep over this round's new queries + the
# bench top-5 (tools/sweep_list.txt), per-query budget 120 s — the cliff
# detector (r4: caught join_fuzzy_blocked's 313M-pair quadratic). Replica
# is rebuilt when missing; rerun make_replica manually after fixture regen.
[ -f /tmp/scale10/documents.parquet ] || python tools/make_replica.py
python tools/scale_sweep.py --budget 120 --list tools/sweep_list.txt
