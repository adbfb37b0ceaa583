#!/usr/bin/env bash
# Pre-merge gate (the "second driver" the round-5 verdict asked for):
# fails the build on ANY registry/oracle mismatch, not just the 50
# queries in the current driver rotation window.
#
#   tools/gate.sh            # full: pytest suite + whole-registry canary
#   tools/gate.sh --quick    # canary only (~7 min at sf0.01)
#
# Run before every milestone commit; the round-2 rot (a timestamp
# regression that sat unverified outside the driver window) is the
# incident this gate exists to prevent.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" != "--quick" ]]; then
  python -m pytest tests/ -x -q
fi
python tools/refresh_counts.py --check
python tools/check_all.py
