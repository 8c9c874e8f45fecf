"""One-shot notices when a preset-expected Pallas kernel is dropped.

Every kernel in this package self-falls-back to its exact jnp twin when a
``*_supported()`` gate misses (batch > 8, VMEM budget, alignment, non-TPU).
The fallback is correct but slower — e.g. serving at bs16 loses the round-2/3
head/style kernels (328 → 271 fps/chip measured) — so on TPU the drop is
logged once per (kernel, reason), mirroring the eval-bucket fallback warning
in ``FModelDepthCond.test()``.
"""

from __future__ import annotations

import logging

_warned: set = set()


def warn_kernel_drop(kernel: str, reason: str) -> None:
    # dedupe on the kernel name only: reasons embed concrete shapes/dtypes,
    # and per-shape eval workloads (bucketing disabled, whole-image sets)
    # would otherwise log one line per distinct shape and grow _warned
    # without bound (ADVICE r4). The first reason carries the detail.
    if kernel in _warned:
        return
    _warned.add(kernel)
    logging.getLogger("base").warning(
        "Pallas kernel %s disabled for this program: %s "
        "(further drops of this kernel are not logged)", kernel, reason)
