#!/usr/bin/env bash
# Adversarial-order CI (round-9 verdict task #8): run the suite in a
# hostile cross-module order so session-state bugs (a completed
# Observation poisoning later ml fits, cached-session bleed, temp-view
# collisions) cannot hide behind pytest's default alphabetical order.
#
# Two passes:
#   1. MDF_TEST_ORDER=reverse  — full reversed collection order;
#   2. MDF_TEST_ORDER=<seed>   — seeded whole-module shuffle (modules stay
#      contiguous so module-scoped fixtures build once).
# The seed defaults to the round number if given, else 10.
set -euo pipefail
cd "$(dirname "$0")/.."
SEED="${1:-10}"
echo "== pass 1: reversed order =="
MDF_TEST_ORDER=reverse python -m pytest tests/ -q "${@:2}"
echo "== pass 2: module shuffle (seed=$SEED) =="
MDF_TEST_ORDER="$SEED" python -m pytest tests/ -q "${@:2}"
echo "adversarial-order: both passes green"
