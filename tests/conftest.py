"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image pre-imports jax at interpreter startup with platforms preset to
# "axon,cpu" (the TPU tunnel), so the env vars above arrive too late —
# force the CPU backend through the live config before any device is touched.
import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_CODES = Path("/root/reference/codes")

requires_reference = pytest.mark.skipif(
    not REFERENCE_CODES.is_dir(),
    reason="reference repo not mounted at /root/reference",
)


@pytest.fixture(scope="session")
def reference_path():
    """Add the reference's codes/ dir to sys.path for golden-value generation.

    The reference is used read-only as an oracle; nothing from it ships in
    this package.
    """
    if not REFERENCE_CODES.is_dir():
        pytest.skip("reference repo not mounted")
    p = str(REFERENCE_CODES)
    if p not in sys.path:
        sys.path.insert(0, p)
    # Stub modules the reference imports but this image doesn't ship.
    import types

    if "lmdb" not in sys.modules:
        try:
            import lmdb  # noqa: F401
        except ImportError:
            sys.modules["lmdb"] = types.ModuleType("lmdb")
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("torchvision stub")
        )
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    return REFERENCE_CODES
