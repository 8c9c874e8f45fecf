from endosr.kernels.fused_in_mod import fused_instance_norm_modulate
from endosr.kernels.fused_mod import (
    fused_modulation,
    fused_modulation_reference,
)
from endosr.kernels.output_stage import output_stage, output_stage_reference

__all__ = [
    "fused_instance_norm_modulate",
    "fused_modulation",
    "fused_modulation_reference",
    "output_stage",
    "output_stage_reference",
]
