#!/usr/bin/env bash
# Closing-bench runner for a QUIET window (round-12 judge finding 2:
# the committed BENCH_r12.json was captured on a contended box —
# passes 0, boxdrift 1.52, untouched one-second queries reading
# 7-92x — while the same code measured 365 s clean 80 minutes
# earlier). The artifact generation now defends itself twice:
#
#   1. THIS SCRIPT refuses to start while /proc/loadavg's 1-min
#      average exceeds LOAD_MAX (default 3.0 on this 32-thread box —
#      sbt idling + background flushes read ~1-2), polling every 30 s
#      up to WAIT_MAX seconds before giving up loudly.
#   2. graft.Bench itself stamps "invalid": true into any artifact
#      whose boxdrift exceeds its threshold or whose min-2 sweep did
#      not complete, and the regression gate skips invalid priors.
#
# After the run it prints the artifact's quality fields so the caller
# can see at a glance whether the number is stampable.
#
# Usage: scripts/bench_clean.sh [sfdir]   (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."

SFDIR="${1:-/root/testdata/sf0.1}"
LOAD_MAX="${LOAD_MAX:-3.0}"
WAIT_MAX="${WAIT_MAX:-1800}"

waited=0
while :; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(awk -v l="$load" -v m="$LOAD_MAX" 'BEGIN{print (l<=m)?1:0}')
  if [ "$ok" = 1 ]; then
    echo "== load $load <= $LOAD_MAX — starting closing bench ($SFDIR)"
    break
  fi
  if [ "$waited" -ge "$WAIT_MAX" ]; then
    echo "!! load $load still > $LOAD_MAX after ${WAIT_MAX}s — running anyway (artifact will self-mark invalid if drifted)" >&2
    break
  fi
  echo "== load $load > $LOAD_MAX — waiting for a quiet window (${waited}s/${WAIT_MAX}s)"
  sleep 30
  waited=$((waited + 30))
done

run_and_grade() {
  # Record pre-run mtimes so the grader only considers a file THIS
  # run actually rewrote (round-14 ADVICE: with both files left over
  # from prior runs, max-by-mtime silently graded a stale artifact;
  # with neither present a crash-before-emit raised a bare ValueError).
  pre_local=$(stat -c %Y BENCH_LOCAL.json 2>/dev/null || echo 0)
  pre_spot=$(stat -c %Y BENCH_SPOT.json 2>/dev/null || echo 0)
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -4
  echo
  # Bench routes a run that must not displace a graded-clean closing
  # artifact to BENCH_SPOT.json (round-13 finding 1) — grade whichever
  # file THIS run wrote.
  PRE_LOCAL="$pre_local" PRE_SPOT="$pre_spot" python3 - <<'PY'
import json, os, sys
pre = {"BENCH_LOCAL.json": int(os.environ.get("PRE_LOCAL", "0")),
       "BENCH_SPOT.json": int(os.environ.get("PRE_SPOT", "0"))}
cands = [p for p in pre
         if os.path.exists(p) and int(os.path.getmtime(p)) > pre[p]]
if not cands:
    print("== NOT CLEAN — no artifact emitted by this run "
          "(bench crashed or was killed before its JSON line)")
    sys.exit(3)
path = max(cands, key=os.path.getmtime)
print(f"== artifact quality ({path}):")
d = json.load(open(path))
fields = {k: d.get(k) for k in
          ("value", "passes", "singles", "settled", "boxdrift",
           "invalid", "invalid_reason")}
print(json.dumps(fields))
clean = (d.get("passes", 0) >= 2 and d.get("singles", 1) == 0
         and not d.get("invalid", False))
if path != "BENCH_LOCAL.json":
    print("== run landed in BENCH_SPOT.json — the existing "
          "BENCH_LOCAL.json closing artifact was kept")
print("== CLEAN closing artifact" if clean and path == "BENCH_LOCAL.json"
      else "== NOT CLEAN — rerun in a quieter window before stamping")
sys.exit(0 if clean and path == "BENCH_LOCAL.json" else 3)
PY
}

# one bounded retry: the second run reads the parquet out of a warm page
# cache, so cold-pass inflation (which reads as boxdrift) settles
if ! run_and_grade; then
  echo "== retrying once after a ${RETRY_COOLDOWN:-60}s cool-down (warm cache)"
  sleep "${RETRY_COOLDOWN:-60}"
  run_and_grade || true
fi
