#!/usr/bin/env bash
# Evidence-artifact refresh — run as part of the SAME commit that
# registers a query wave (r7 verdict #1: stale committed evidence is a
# process defect even when the queries are green).
#
# Runs the full oracle gate and the full plan audit, writes the round
# artifacts, and FAILS unless each artifact enumerates exactly the
# registered catalog (count-equality assert) with zero failures/flags.
#
# Usage: tools/refresh_evidence.sh <round>   # e.g. tools/refresh_evidence.sh r08
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/refresh_evidence.sh <round-tag, e.g. r08>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
ORACLE_OUT="ORACLE_${ROUND}.txt"
PLAN_OUT="PLANAUDIT_${ROUND}.json"

REGISTERED=$(python - <<'EOF'
import sys
sys.path.insert(0, ".")
import __spark_entry__ as m
print(len(m.queries()))
EOF
)
echo "registered queries: ${REGISTERED}"

echo "== oracle gate (${SF_DIR}) -> ${ORACLE_OUT}"
python tools/check_oracle.py "${SF_DIR}" 2>&1 \
  | tr '\r' '\n' | sed 's/^[[:space:]]*//' \
  | grep -vE "WARN|INFO|^\[Stage|^$" > "${ORACLE_OUT}" || {
    echo "ORACLE GATE FAILED — see ${ORACLE_OUT}"; exit 1; }
ORACLE_PASS=$(grep -c "^PASS " "${ORACLE_OUT}" || true)
echo "oracle PASS lines: ${ORACLE_PASS}"

echo "== plan audit -> ${PLAN_OUT}"
python tools/plan_audit.py "${SF_DIR}" > "${PLAN_OUT}.raw" 2>/dev/null || {
    echo "PLAN AUDIT FAILED (cartesian/BNLJ flag) — see ${PLAN_OUT}.raw"; exit 1; }
grep -E '^\{' "${PLAN_OUT}.raw" > "${PLAN_OUT}"
rm -f "${PLAN_OUT}.raw"
PLAN_ROWS=$(grep -c '"query"' "${PLAN_OUT}" || true)
echo "plan rows: ${PLAN_ROWS}"

# count-equality asserts: every registered query must appear in BOTH
# artifacts, and the oracle gate must have ended green
if [ "${ORACLE_PASS}" -ne "${REGISTERED}" ]; then
  echo "STALE EVIDENCE: ${ORACLE_PASS} oracle PASS lines != ${REGISTERED} registered queries"
  exit 1
fi
if ! grep -q "all queries pass" "${ORACLE_OUT}"; then
  echo "ORACLE GATE NOT GREEN"; exit 1
fi
if [ "${PLAN_ROWS}" -ne "${REGISTERED}" ]; then
  echo "STALE EVIDENCE: ${PLAN_ROWS} plan rows != ${REGISTERED} registered queries"
  exit 1
fi
if ! grep -q '"flagged": \[\]' "${PLAN_OUT}"; then
  echo "PLAN AUDIT HAS FLAGS"; exit 1
fi
echo "evidence refreshed: ${ORACLE_OUT} (${ORACLE_PASS}) + ${PLAN_OUT} (${PLAN_ROWS}) for ${REGISTERED} registered queries"
