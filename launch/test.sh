#!/usr/bin/env bash
# Inference launcher (twin of the reference's launch/test.sh).
python3 test.py -opt_F options/test/test_depthNet.yml
