#!/usr/bin/env bash
# Sweep for exp3 (see config/exp/exp3.yaml).
exec bash "$(dirname "$0")/run_exp_common.sh" exp/exp3 "$@"
