#!/usr/bin/env bash
# Round-5 post-reboot recovery queue.
#
# A mid-round machine reboot wiped runs/ (checkpoints, fixtures, prdc
# pickles, .done markers).  Committed evidence under docs/evidence/
# survived; this queue rebuilds the artifacts that had NOT yet been
# banked, ordered so the two that unblock tests land first:
#
#   F1/F2 fixtures (recorded recipes -> deterministic rebuild)
#   R1  classifier pretrain (nb04; prerequisite of the cap05 arm)
#   R2  seed-2 JAX equilibrium twin  -> fixes the summary_match_jax_s2 skip
#   R3  seed-2 oracle summary        -> docs/evidence/summary_match_jax_s2.json
#   R4  3-seed identity report (supersedes the 2-seed one in place)
#   R5  cap05 (preset 05) 240 epochs -> fixes test_capstone_oracle_summaries
#   R6  e240 oracle summary          -> docs/evidence/summary_cap05_e240.json
#   R7  cap03 (preset 03) 120 epochs (PRDC r05 refresh prerequisite)
#   R8  VGG19-BN fine-tune -> the vgg-CelebA extractor
#   R9a/b/c PRDC: untrained init + cap03(e120) + cap05(e240)
#   R10 comparison table -> docs/evidence/prdc_comparison_r05.json
#   R11 re-execute the nb06 mirror (renders the r05 artifact)
#   R12/R13 latent sample sweeps over both capstone checkpoints
#
# Resumable: each stage leaves runs/.done_<stage>; rerunning skips done
# stages, and training stages pass --resume so a timeout costs one
# re-invoke, not a restart.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs runs/prdc

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

stage R1 python scripts/pretrain_classifier.py --out runs/clf \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --train-num 200 --val-num 36 --test-num 64 --batch-size 32 --epochs 12

stage R2 python scripts/train.py --preset 03_srgan_nopretraining --out runs/seed2 \
  --data-root "$BOOST_IMG" --attr-file "$BOOST_ATTR" \
  --epochs 60 --batch-size 16 --train-num 100 --test-num 16 \
  --g-nch 16 --d-nch 16 --e-nch 16 --seed 2 --resume

stage R3 python scripts/translation_oracle.py --ckpt runs/seed2/ckpt \
  --data-root "$BOOST_IMG" --attr-file "$BOOST_ATTR" --test-num 16 \
  --out docs/evidence/summary_match_jax_s2.json

stage R4 python scripts/compare_seed_equilibria.py \
  --pair 0 docs/evidence/summary_match_torch.json docs/evidence/summary_match_jax.json \
  --pair 1 docs/evidence/summary_match_torch_s1.json docs/evidence/summary_match_jax_s1.json \
  --pair 2 docs/evidence/summary_match_torch_s2.json docs/evidence/summary_match_jax_s2.json \
  --out docs/evidence/seed_equilibria_r04.json

STAGE_TIMEOUT=16200
stage R5 python scripts/train.py --preset 05_srgan_pretrained --out runs/cap05 \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --classifier-ckpt runs/clf/classifier_best \
  --epochs 240 --batch-size 32 --train-num 200 --test-num 64 \
  --resume --grid-every-epochs 10
STAGE_TIMEOUT=7200

stage R6 python scripts/translation_oracle.py --ckpt runs/cap05/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" --test-num 64 \
  --out docs/evidence/summary_cap05_e240.json

STAGE_TIMEOUT=10800
stage R7 python scripts/train.py --preset 03_srgan_nopretraining --out runs/cap03 \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --epochs 120 --batch-size 32 --train-num 200 --test-num 64 \
  --resume --grid-every-epochs 10
STAGE_TIMEOUT=7200

stage R8 python scripts/finetune_vgg.py --out runs/vgg \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --train-num 200 --val-num 36 --epochs 30 --val-every 3 --batch-size 32

PRDC_COMMON=(--data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR"
  --feature-extractors vgg-initialization vgg-CelebA
  --vgg-celeba-ckpt runs/vgg/vgg_celeba_best
  --test-num 64 --num-samples 64 --nearest-k 5)

stage R9a python scripts/evaluate_prdc.py --ckpt runs/cap03/ckpt --init-baseline \
  --out runs/prdc/init.pkl "${PRDC_COMMON[@]}"
stage R9b python scripts/evaluate_prdc.py --ckpt runs/cap03/ckpt \
  --out runs/prdc/cap03.pkl "${PRDC_COMMON[@]}"
stage R9c python scripts/evaluate_prdc.py --ckpt runs/cap05/ckpt \
  --out runs/prdc/cap05_e240.pkl "${PRDC_COMMON[@]}"

stage R10 python scripts/compare_results.py \
  runs/prdc/init.pkl runs/prdc/cap03.pkl runs/prdc/cap05_e240.pkl \
  --names init srgan_nopretraining_e120 srgan_pretrained_e240 \
  --json-out docs/evidence/prdc_comparison_r05.json

stage R11 jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=1800 notebooks/06_compare_prdc.ipynb

stage R12 python scripts/sample_sweep.py --ckpt runs/cap03/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --num-latents 24 --out runs/sweep03
stage R13 python scripts/sample_sweep.py --ckpt runs/cap05/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --num-latents 24 --out runs/sweep05

echo "RECOVERY QUEUE COMPLETE $(date -u '+%F %T')"
