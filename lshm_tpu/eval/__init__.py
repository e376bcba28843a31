from lshm_tpu.eval.clustering import (
    EvalResult,
    baseline_distance_matrix,
    evaluate_sap,
    nmi,
)

__all__ = ["EvalResult", "baseline_distance_matrix", "evaluate_sap", "nmi"]
