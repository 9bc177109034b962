#!/usr/bin/env bash
# Round-4 evidence queue: the PRDC capstone journey + the seed-1 JAX twin.
#
# Reconstructs the runs/queue.sh plan that was lost to the mid-round machine
# reboot (docs/PERF.md "Round-4 bench status") — committed to the repo this
# time so a reboot can only cost completed-run artifacts, never the plan.
#
# Resumable: each stage leaves runs/.done_<stage>; rerunning skips finished
# stages.  Fixtures come from scripts/make_fixture.py recorded recipes.
# Stages run on whatever backend the environment provides (the real chip
# under the default JAX_PLATFORMS=axon).
#
# Journey (VERDICT r3 item 1, reference nb04 -> nb05 -> nb06):
#   S1  classifier pretraining on the structured fixture (nb04)
#   S2  preset 03 (srgan_nopretraining) 120 epochs (nb03 geometry)
#   S3  preset 05 (srgan_pretrained) 120 epochs with the S1 encoder (nb05)
#   S4  VGG19-BN fine-tune on the fixture -> the vgg-CelebA extractor (nb B)
#   S5  PRDC evaluation: untrained-init baseline + both trained runs,
#       2 real extractors (vgg-initialization + vgg-CelebA)        (nb06)
#   S6  comparison tables -> docs/evidence/prdc_comparison_r04.json
#   S7  oracle-accuracy summaries for both capstone runs
#   S8  seed-1 JAX twin of the equilibrium study (VERDICT r3 item 4)
#   S9  seed-1 oracle summary -> docs/evidence/summary_match_jax_s1.json
#   S10 4-way seed-equilibrium identity report

set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

STRUCT_IMG=runs/fixtures/structured/img
STRUCT_ATTR=runs/fixtures/structured/list_attr_celeba.txt
BOOST_IMG=runs/fixtures/boost/img
BOOST_ATTR=runs/fixtures/boost/list_attr_celeba.txt

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

stage F1 python scripts/make_fixture.py --out runs/fixtures/structured --recipe structured
stage F2 python scripts/make_fixture.py --out runs/fixtures/boost --recipe boost

# S1: nb04 — same geometry as the committed clf_pretrain_r04.json evidence
# (200/36/64 per class, batch 32, 12 epochs, full width e_nch 64).
stage S1 python scripts/pretrain_classifier.py --out runs/clf \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --train-num 200 --val-num 36 --test-num 64 --batch-size 32 --epochs 12

# S2/S3: both capstone presets at full model width (the preset default),
# batch 32 (the round-2 preset-matrix geometry -> warm service-side compile
# cache), 120 epochs on the structured fixture.  --resume + the raised
# timeout make a SIGTERM'd stage cost one re-invoke, not a restart (the
# first S2 attempt hit the 7200 s ceiling at epoch 105/120).
STAGE_TIMEOUT=10800
stage S2 python scripts/train.py --preset 03_srgan_nopretraining --out runs/cap03 \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --epochs 120 --batch-size 32 --train-num 200 --test-num 64 --resume

stage S3 python scripts/train.py --preset 05_srgan_pretrained --out runs/cap05 \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --classifier-ckpt runs/clf/classifier_best \
  --epochs 120 --batch-size 32 --train-num 200 --test-num 64 --resume
STAGE_TIMEOUT=7200

# S4: the vgg-CelebA extractor, fine-tuned from scratch on the fixture
# (zero egress -> no ImageNet .pth; reference evaluation.py:56 fine-tunes
# the same architecture on the real CelebA).
stage S4 python scripts/finetune_vgg.py --out runs/vgg \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --train-num 200 --val-num 36 --epochs 30 --val-every 3 --batch-size 32

PRDC_COMMON=(--data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR"
  --feature-extractors vgg-initialization vgg-CelebA
  --vgg-celeba-ckpt runs/vgg/vgg_celeba_best
  --test-num 64 --num-samples 64 --nearest-k 5)

stage S5a python scripts/evaluate_prdc.py --ckpt runs/cap03/ckpt --init-baseline \
  --out runs/prdc/init.pkl "${PRDC_COMMON[@]}"
stage S5b python scripts/evaluate_prdc.py --ckpt runs/cap03/ckpt \
  --out runs/prdc/cap03.pkl "${PRDC_COMMON[@]}"
stage S5c python scripts/evaluate_prdc.py --ckpt runs/cap05/ckpt \
  --out runs/prdc/cap05.pkl "${PRDC_COMMON[@]}"

stage S6 python scripts/compare_results.py \
  runs/prdc/init.pkl runs/prdc/cap03.pkl runs/prdc/cap05.pkl \
  --names init srgan_nopretraining srgan_pretrained \
  --json-out docs/evidence/prdc_comparison_r04.json

stage S7a python scripts/translation_oracle.py --ckpt runs/cap03/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" --test-num 64 \
  --out docs/evidence/summary_cap03_e120.json
stage S7b python scripts/translation_oracle.py --ckpt runs/cap05/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" --test-num 64 \
  --out docs/evidence/summary_cap05_e120.json

# S8/S9: seed-1 JAX twin — geometry pinned to config_match_jax.json
# (the seed-0 run): preset 03, 128px, nch 16, batch 16, train_num 100,
# 60 epochs, boost fixture; only the seed differs.
stage S8 python scripts/train.py --preset 03_srgan_nopretraining --out runs/seed1 \
  --data-root "$BOOST_IMG" --attr-file "$BOOST_ATTR" \
  --epochs 60 --batch-size 16 --train-num 100 --test-num 16 \
  --g-nch 16 --d-nch 16 --e-nch 16 --seed 1 --resume

stage S9 python scripts/translation_oracle.py --ckpt runs/seed1/ckpt \
  --data-root "$BOOST_IMG" --attr-file "$BOOST_ATTR" --test-num 16 \
  --out docs/evidence/summary_match_jax_s1.json

stage S10 python scripts/compare_seed_equilibria.py \
  --pair 0 docs/evidence/summary_match_torch.json docs/evidence/summary_match_jax.json \
  --pair 1 docs/evidence/summary_match_torch_s1.json docs/evidence/summary_match_jax_s1.json \
  --out docs/evidence/seed_equilibria_r04.json

echo "QUEUE COMPLETE $(date -u '+%F %T')"
