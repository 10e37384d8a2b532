#!/bin/bash
# TTL evaluation launcher - same knobs as the reference's scripts/test_ttl.sh,
# driving the TPU CLI. Usage: scripts/test_ttl.sh A/V/R/K [DATA_ROOT]

DATA_ROOT=${2:-datasets}
TEST_SETS=$1                 # A/V/R/K for out-of-domain classification
MODE='test'
ARCH='ViT-B/16'              # ViT-B/16, ViT-B/32, ViT-L/14, RN50, RN101
BS=64
CTX_INIT='a_photo_of_a'
LR=5e-3
TTA_STEPS=1
PRINT_FRQ=10
SELECTION_P=0.1
LAYER_RANGE=9,11
INIT_METHOD='xavier'
LORA_ENCODER='image'         # image, text, prompt (TPT)
RANK=16
DEYO_SELECTION=True
SAMPLE_BATCH=8               # TPU: samples adapted concurrently

python3 -m ttl_tpu --data "$DATA_ROOT" \
               --test_sets "$TEST_SETS" \
               --dataset_mode $MODE \
               --arch $ARCH \
               -b $BS \
               --ctx_init $CTX_INIT \
               --lr $LR \
               --tta_steps $TTA_STEPS \
               --print_freq $PRINT_FRQ \
               --selection_p $SELECTION_P \
               --layer_range $LAYER_RANGE \
               --init_method $INIT_METHOD \
               --lora_encoder $LORA_ENCODER \
               --rank $RANK \
               --deyo_selection $DEYO_SELECTION \
               --sample_batch $SAMPLE_BATCH \
               "${@:3}"
