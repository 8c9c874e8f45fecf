from endosr.kernels.fused_in_mod import fused_instance_norm_modulate

__all__ = ["fused_instance_norm_modulate"]
