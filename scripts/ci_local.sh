#!/usr/bin/env bash
# Local equivalent of .github/workflows/{pytest,linting}.yml — for
# environments with no GitHub runner (this box). Mirrors the CI gates:
#   1. lint tests (stdlib-based; run ruff too if installed)
#   2. the test suite, in deterministic quarters (--shard, tests/README_SHARDS.md)
# Usage: scripts/ci_local.sh [shard]   (shard = 1..4, default: all four)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint gates =="
python -m pytest tests/linting -q
if command -v ruff >/dev/null 2>&1; then
    ruff check cyten_tpu/ tests/ scripts/ bench.py
else
    echo "(ruff not installed locally; tests/linting covers the stdlib gates)"
fi

shards=${1:-"1 2 3 4"}
for k in $shards; do
    echo "== suite shard $k/4 =="
    python -m pytest tests/ -q --shard "$k/4" -p no:cacheprovider
done
echo "== ci_local: all green =="
