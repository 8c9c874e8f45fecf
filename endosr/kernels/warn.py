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
    key = (kernel, reason)
    if key in _warned:
        return
    _warned.add(key)
    logging.getLogger("base").warning(
        "Pallas kernel %s disabled for this program: %s", kernel, reason)
