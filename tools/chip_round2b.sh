#!/bin/bash
# Round-2 second chip session: style-dot / head-conv / packed_up1 A/Bs.
# Runs unattended once the axon tunnel is up; every step bounded + logged.
# Usage: tools/chip_round2b.sh [outdir]
OUT=${1:-/tmp/chip_session/r2b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

wait_tunnel() {
    for i in $(seq 1 60); do
        if timeout 90 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))" >/dev/null 2>&1; then
            return 0
        fi
        sleep 60
    done
    echo "tunnel never came up" >> "$OUT/log.txt"
    return 1
}

step() {  # step <name> <timeout_s> <cmd...>
    local name=$1 to=$2; shift 2
    echo "=== $name: $* ===" >> "$OUT/log.txt"
    wait_tunnel || return 1
    timeout "$to" "$@" >> "$OUT/$name.txt" 2>"$OUT/$name.err"
    echo "$name exit=$?" >> "$OUT/log.txt"
}

# 1) style-dot kernel variants (isolated; one subprocess each)
step sd_loop     600 python tools/exp_styledot.py --variant loop
step sd_bat8x256 600 python tools/exp_styledot.py --variant batched --th 8 --mblk 256
step sd_bat8x512 600 python tools/exp_styledot.py --variant batched --th 8 --mblk 512
step sd_bat16    600 python tools/exp_styledot.py --variant batched --th 16 --mblk 256
step sd_einsum   600 python tools/exp_styledot.py --variant einsum

# 2) head-conv variants
step hc_producer  600 python tools/exp_headconv.py --variant producer
step hc_prodfused 600 python tools/exp_headconv.py --variant prodfused
step hc_barrier   600 python tools/exp_headconv.py --variant barrier
step hc_plain     600 python tools/exp_headconv.py --variant plain
step hc_out128    600 python tools/exp_headconv.py --variant out128
step hc_hwnc      600 python tools/exp_headconv.py --variant hwnc

# 3) packed_up1 A/B at bs8 (full model)
step qf_default   1200 python tools/quick_fps.py 8
step qf_packedup1 1200 env NET_KW='{"packed_up1": true}' python tools/quick_fps.py 8

# 4) best style body in the full model (if batched won, measure it)
step qf_batched   1200 env ENDOSR_STYLE_BODY=batched python tools/quick_fps.py 8
step qf_pk_bat    1200 env ENDOSR_STYLE_BODY=batched NET_KW='{"packed_up1": true}' python tools/quick_fps.py 8

# 5) bs16 with defaults (HBM-locality check at the new config)
step qf_bs16      1500 python tools/quick_fps.py 16

echo DONE >> "$OUT/log.txt"

# 6) optimized HLO dump for offline fusion analysis (compile is cached)
step hlo_dump 900 python tools/dump_hlo.py /tmp/chip_session/r2b/flagship_x8.hlo 8

# 7) head-kernel A/B in the full model (pallas_head landed after launch)
step qf_head_off  1200 env NET_KW='{"pallas_head": false}' python tools/quick_fps.py 8
step qf_head_on   1200 python tools/quick_fps.py 8
step qf_h_bs16    1500 python tools/quick_fps.py 16

# 8) the north-star bench with whatever defaults are in by now
step bench_final  1800 python bench.py
echo ALLDONE >> "$OUT/log.txt"

# 9) training MFU + per-scale ladder with the round-2 kernels in
step bench_train  1800 python tools/bench_train.py
step bench_scales 3600 python tools/bench_scales.py
echo FULLYDONE >> "$OUT/log.txt"
