from lshm_tpu.optim.lbfgs import LBFGS, LBFGSState, lbfgs_init, make_lbfgs_step

__all__ = ["LBFGS", "LBFGSState", "lbfgs_init", "make_lbfgs_step"]
