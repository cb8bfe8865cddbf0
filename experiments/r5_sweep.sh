#!/bin/bash
# Round-5 frontend-form sweep: run when the TPU tunnel is healthy.
# A/Bs the wide (shipping), banded, and tf-raised kernel forms at the
# flagship shape and the narrow modes, then refreshes the ladder.
set -u
cd "$(dirname "$0")/.."
B="timeout 590 python bench.py --no-insurance"
log() { echo "### $*" >&2; }

log "wide (ship) mode 0"
$B --channels 32 --blocks 12 2>&1 | tail -1
log "banded mode 0"
RTSDR_FRONTEND_BAND=1 $B --channels 32 --blocks 12 2>&1 | tail -1
log "wide tf=256 mode 0"
RTSDR_FRONTEND_TF=256 $B --channels 32 --blocks 12 2>&1 | tail -1
log "wide (ship) mode 0 again (drift check)"
$B --channels 32 --blocks 12 2>&1 | tail -1

log "mode 1: ship vs banded"
$B --channels 32 --blocks 12 --mode 1 2>&1 | tail -1
RTSDR_FRONTEND_BAND=1 $B --channels 32 --blocks 12 --mode 1 2>&1 | tail -1
log "mode 3: ship (band ineligible, falls back wide)"
$B --channels 32 --blocks 12 --mode 3 2>&1 | tail -1
