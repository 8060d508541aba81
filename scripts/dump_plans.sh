#!/bin/bash
# Dump .explain("formatted") for the named queries into per-query files.
# Usage: dump_plans.sh <outdir> <suffix> <sfdir> q1 q2 ...
# Writes <outdir>/<query>_<suffix>.txt for each query.
# Runs graft.PlanAudit once (one JVM, one sbt) and splits its output on
# the "===== <name> =====" markers. Keep sbt invocations serialized with
# any other sbt run (target/ races).
set -euo pipefail
out=$1; suffix=$2; sf=$3; shift 3
mkdir -p "$out"
tmp=$(mktemp)
sbt -batch "runMain graft.PlanAudit $sf $*" 2>/dev/null \
  | sed -n '/^===== /,$p' > "$tmp"
awk -v out="$out" -v suf="$suffix" '
  /^===== / { if (f) close(f); q=$2; f=out "/" q "_" suf ".txt"; next }
  f { print > f }
' "$tmp"
rm -f "$tmp"
ls -la "$out" | tail -n +2
