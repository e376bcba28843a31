from lshm_tpu.kernels.khm_pallas import khm_loss_fused, khm_loss_pallas_available

__all__ = ["khm_loss_fused", "khm_loss_pallas_available"]
