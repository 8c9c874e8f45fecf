#!/usr/bin/env bash
mkdir -p experiments tmp results
