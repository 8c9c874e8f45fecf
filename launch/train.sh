#!/usr/bin/env bash
# Flagship training launcher (twin of the reference's launch/train.sh).
python3 train.py -opt_F options/train/train_depthNet_SEAN_depthMask_x8.yml
