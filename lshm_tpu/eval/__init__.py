from lshm_tpu.eval.clustering import (
    EvalResult,
    baseline_distance_matrix,
    evaluate_sap,
    nmi,
    save_recon_panels,
)

__all__ = [
    "EvalResult",
    "baseline_distance_matrix",
    "evaluate_sap",
    "nmi",
    "save_recon_panels",
]
