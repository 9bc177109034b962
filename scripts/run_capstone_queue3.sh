#!/usr/bin/env bash
# Round-5 evidence queue (VERDICT r4 items 1/3/4):
#
#   gate  wait for the round-4 chain (queue1 && queue2) to exit, then
#         re-invoke queue2 — its stage markers make the rerun a no-op when
#         everything succeeded and a retry of exactly the FAILED/unrun
#         stages otherwise (the r4 T2 failure mode: queue2 raced ahead of
#         queue1's S3).  Dependency-gating lives HERE, in the orchestrator,
#         so the per-stage scripts stay order-free.
#   U1    extend the preset-05 capstone run 120 -> 240 epochs (--resume).
#         Rationale: at e120 the frozen-trunk arm's oracle accuracy (0.230)
#         had not yet crossed the untrained-init bar (0.25); its four
#         learned pairs (0.48-0.86) track cap03's, which reached 1.0 —
#         more epochs, same trajectory.  Grid cadence thinned 10x.
#   U2    oracle summary of the e240 checkpoint
#   U3    PRDC of the e240 checkpoint (same extractors as queue-1 S5*)
#   U4    regenerate the comparison table as prdc_comparison_r05.json
#         (adds the e240 row; the r04 artifact stays committed as-is)
#   U5    re-execute the nb06 mirror so its outputs render the r05 artifact
#
# Resumable: rerunning skips stages with runs/.done_* markers.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

STRUCT_IMG=runs/fixtures/structured/img
STRUCT_ATTR=runs/fixtures/structured/list_attr_celeba.txt

stage() {
  local name=$1; shift
  if [ -f "runs/.done_$name" ]; then echo "[$name] already done, skip"; return 0; fi
  echo "[$name] start $(date -u '+%F %T')"
  if timeout "${STAGE_TIMEOUT:-7200}" "$@" > "runs/logs/$name.log" 2>&1; then
    touch "runs/.done_$name"
    echo "[$name] OK $(date -u '+%F %T')"
  else
    echo "[$name] FAILED rc=$? — see runs/logs/$name.log"
    exit 1
  fi
}

# --- gate: the round-4 chain owns the chip until it exits -------------------
if [ -f /tmp/queue.pid ] && kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; then
  echo "[gate] waiting on round-4 chain pid $(cat /tmp/queue.pid)"
  while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 60; done
fi
echo "[gate] round-4 chain done $(date -u '+%F %T')"

# --- retry queue2 if any of its stages is unfinished ------------------------
if [ ! -f runs/.done_T6 ]; then
  echo "[retry] queue2 incomplete — re-invoking (done stages skip)"
  bash scripts/run_capstone_queue2.sh >> runs/queue2.out 2>&1 \
    || { echo "[retry] queue2 still failing — see runs/queue2.out"; exit 1; }
fi

STAGE_TIMEOUT=10800
stage U1 python scripts/train.py --preset 05_srgan_pretrained --out runs/cap05 \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --classifier-ckpt runs/clf/classifier_best \
  --epochs 240 --batch-size 32 --train-num 200 --test-num 64 \
  --resume --grid-every-epochs 10
STAGE_TIMEOUT=7200

stage U2 python scripts/translation_oracle.py --ckpt runs/cap05/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" --test-num 64 \
  --out docs/evidence/summary_cap05_e240.json

stage U3 python scripts/evaluate_prdc.py --ckpt runs/cap05/ckpt \
  --out runs/prdc/cap05_e240.pkl \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --feature-extractors vgg-initialization vgg-CelebA \
  --vgg-celeba-ckpt runs/vgg/vgg_celeba_best \
  --test-num 64 --num-samples 64 --nearest-k 5

stage U4 python scripts/compare_results.py \
  runs/prdc/init.pkl runs/prdc/cap03.pkl runs/prdc/cap05.pkl \
  runs/prdc/cap05_e240.pkl \
  --names init srgan_nopretraining_e120 srgan_pretrained_e120 \
          srgan_pretrained_e240 \
  --json-out docs/evidence/prdc_comparison_r05.json

stage U5 jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=1800 notebooks/06_compare_prdc.ipynb

echo "QUEUE3 COMPLETE $(date -u '+%F %T')"
