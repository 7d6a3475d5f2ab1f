#!/bin/sh
# Fast CI gate: one golden per layer + device-path exactness on the
# fused pair kernels.  ~1 min on CPU; the full suite (~1 h) is the
# release gate.  See tests/conftest.py SMOKE_MODULES for the tier
# definition.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m smoke -q "$@"
