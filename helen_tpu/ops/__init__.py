from helen_tpu.ops.gru_pallas import bigru_apply_fused, fused_bigru_window

__all__ = ["bigru_apply_fused", "fused_bigru_window"]
