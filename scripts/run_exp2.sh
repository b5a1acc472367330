#!/usr/bin/env bash
# Sweep for exp2 (see config/exp/exp2.yaml).
exec bash "$(dirname "$0")/run_exp_common.sh" exp/exp2 "$@"
