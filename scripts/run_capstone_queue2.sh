#!/usr/bin/env bash
# Round-4 evidence queue, part 2 — run after run_capstone_queue.sh:
#   T1/T2 latent sample sweeps over both capstone checkpoints (the
#         test-notebook GIF/grid journey, VERDICT item-1 step 2)
#   T3/T4 seed-2 JAX arm of the equilibrium study (torch seed-2 runs
#         separately on CPU; the final 3-seed comparison is assembled
#         once both sides exist)
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
  if timeout 7200 "$@" > "runs/logs/$name.log" 2>&1; then
    touch "runs/.done_$name"
    echo "[$name] OK $(date -u '+%F %T')"
  else
    echo "[$name] FAILED rc=$? — see runs/logs/$name.log"
    exit 1
  fi
}

stage T1 python scripts/sample_sweep.py --ckpt runs/cap03/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --num-latents 24 --out runs/sweep03
stage T2 python scripts/sample_sweep.py --ckpt runs/cap05/ckpt \
  --data-root "$STRUCT_IMG" --attr-file "$STRUCT_ATTR" \
  --num-latents 24 --out runs/sweep05

stage T3 python scripts/train.py --preset 03_srgan_nopretraining --out runs/seed2 \
  --data-root "$BOOST_IMG" --attr-file "$BOOST_ATTR" \
  --epochs 60 --batch-size 16 --train-num 100 --test-num 16 \
  --g-nch 16 --d-nch 16 --e-nch 16 --seed 2 --resume

stage T4 python scripts/translation_oracle.py --ckpt runs/seed2/ckpt \
  --data-root "$BOOST_IMG" --attr-file "$BOOST_ATTR" --test-num 16 \
  --out docs/evidence/summary_match_jax_s2.json

# T5: the full 3-seed identity report (supersedes the queue-1 S10 2-pair
# version in place once the seed-2 JAX arm exists).
stage T5 python scripts/compare_seed_equilibria.py \
  --pair 0 docs/evidence/summary_match_torch.json docs/evidence/summary_match_jax.json \
  --pair 1 docs/evidence/summary_match_torch_s1.json docs/evidence/summary_match_jax_s1.json \
  --pair 2 docs/evidence/summary_match_torch_s2.json docs/evidence/summary_match_jax_s2.json \
  --out docs/evidence/seed_equilibria_r04.json

# T6: re-execute the nb06 mirror so its committed outputs render the
# round-4 comparison artifact produced by queue-1 stage S6.
stage T6 jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=1800 notebooks/06_compare_prdc.ipynb

echo "QUEUE2 COMPLETE $(date -u '+%F %T')"
