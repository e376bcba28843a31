"""RICA linear dictionary learning on flattened spectrogram patches.

Re-implements the reference's sparse-coding script (reference: src/rica_lofar.py:44-104):
alternate (a) solving the sparse code S for a minibatch X = A S by stochastic L-BFGS and
(b) a manual dictionary ascent A += eta * mean_i outer(E_i, S_i) — here one jitted
``E @ S.T / n`` matmul instead of the reference's Python outer-product loop (:92-94).

Sparsity: the reference writes ``torch.linalg.norm(S, 1)`` (:80), which for a matrix is
the *induced* 1-norm (max column abs sum) — almost certainly meant to be the entrywise L1.
Default here is entrywise L1; ``l1_mode='induced'`` reproduces the reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lshm_tpu.config import LBFGSConfig
from lshm_tpu.optim import lbfgs_init, make_lbfgs_step


@dataclass
class RICAConfig:
    input_dim: int                    # L = channels * patch * patch
    dict_size: int = 256              # M hidden atoms
    l1_weight: float = 0.1            # lambda1
    dict_lr: float = 0.1              # eta
    l1_mode: str = "entrywise"        # "entrywise" | "induced" (reference exact)
    solver: LBFGSConfig = None        # S-solver settings

    def __post_init__(self):
        if self.solver is None:
            self.solver = LBFGSConfig(
                lr=1.0, max_iter=10, history_size=7, line_search=True, batch_mode=True
            )


class RICADictionaryLearner:
    def __init__(self, cfg: RICAConfig, seed: int = 0):
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        self.A = jax.random.uniform(key, (cfg.input_dim, cfg.dict_size))
        self._seed = seed
        self._step_cache = {}

    def _loss(self, s_flat, A, X):
        cfg = self.cfg
        n = X.shape[1]
        S = s_flat.reshape(cfg.dict_size, n)
        E = X - A @ S
        recon = jnp.sum(E * E) / (n * cfg.input_dim)
        if cfg.l1_mode == "entrywise":
            l1 = jnp.sum(jnp.abs(S)) / S.size
        else:  # induced matrix 1-norm, the reference's literal formula
            l1 = jnp.max(jnp.sum(jnp.abs(S), axis=0)) / S.size
        return recon + cfg.l1_weight * l1

    def _get_solver(self, n):
        if n not in self._step_cache:
            vf = self._loss
            vg = jax.value_and_grad(self._loss)
            lbfgs = make_lbfgs_step(vg, vf, self.cfg.solver)

            @jax.jit
            def solve_and_update(A, X, s0, opt_state):
                res = lbfgs(s0, opt_state, A, X)
                S = res.x.reshape(self.cfg.dict_size, n)
                E = X - A @ S
                dA = E @ S.T / n                     # vectorized dictionary gradient
                A_new = A + self.cfg.dict_lr * dA
                return A_new, S, res.loss, jnp.linalg.norm(dA)

            self._step_cache[n] = solve_and_update
        return self._step_cache[n]

    def fit_minibatch(self, X: np.ndarray, key: jax.Array) -> dict:
        """X [input_dim, n] column-major samples; one S-solve + one dictionary update.
        Returns metrics {loss, dA_norm}."""
        n = X.shape[1]
        solver = self._get_solver(n)
        s0 = jax.random.uniform(key, (self.cfg.dict_size * n,))
        opt_state = lbfgs_init(s0.size, self.cfg.solver, s0.dtype)
        self.A, S, loss, dA = solver(self.A, jnp.asarray(X), s0, opt_state)
        return {"loss": float(loss), "dA_norm": float(dA)}

    def atoms(self, channels: int, patch: int) -> np.ndarray:
        """Dictionary columns reshaped to [M, patch, patch, channels] for rendering
        (reference saves them as PNGs: src/rica_lofar.py:101-104)."""
        A = np.asarray(self.A)
        return A.T.reshape(self.cfg.dict_size, channels, patch, patch).transpose(0, 2, 3, 1)

    @staticmethod
    def patches_to_columns(patches: np.ndarray) -> np.ndarray:
        """[n, ps, ps, C] NHWC patches -> [C*ps*ps, n] column-major samples with (c, h, w)
        row ordering (matching ``atoms()`` and the reference's NCHW flatten)."""
        n = patches.shape[0]
        return patches.transpose(0, 3, 1, 2).reshape(n, -1).T.copy()

    def save_atom_images(self, out_dir: str, channels: int = 4, patch: int = 128) -> None:
        import os

        from lshm_tpu.utils.rgb import channel_to_rgb, save_image_grid

        os.makedirs(out_dir, exist_ok=True)
        imgs = [channel_to_rgb(a[..., :4]) for a in self.atoms(channels, patch)]
        save_image_grid(imgs, os.path.join(out_dir, "dictionary_atoms.png"))
