#!/bin/bash
# Evidence insurance: commit sweep-log growth every 20 min so a session
# or machine failure can't strand accuracy evidence (the round-2 endgame
# lost its protocol logs to exactly that — VERDICT r2 weak #7 / next #6).
# Scope is restricted to the results-database paths (logs/, PROGRESS.jsonl,
# marker files); source changes are never auto-committed.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${AUTOCOMMIT_DEADLINE:-1787173200}   # 21:00 UTC Aug 19 (round 4)
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 1200
  if ! git diff --quiet -- logs PROGRESS.jsonl 2>/dev/null \
     || [ -n "$(git ls-files --others --exclude-standard logs)" ]; then
    git add logs PROGRESS.jsonl 2>/dev/null
    git commit -q -m "logs: autocommit sweep evidence ($(date -u +%H:%M) UTC)

No-Verification-Needed: evidence-log-only commit, no source changes" \
      2>/dev/null || true
  fi
done
