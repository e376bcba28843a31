"""Training metrics logging.

The reference logs one stdout line per closure evaluation
(``epoch batch admm loss0..rica``; reference: src/kharmonic_lofar.py:176-181).  This
logger reproduces that line format, keeps an in-memory history, and can emit JSONL for
tooling — with per-step wall-clock and throughput, which the reference never measured.
"""

from __future__ import annotations

import json
import time
from typing import Any

import numpy as np

_ORDER = ("loss0", "loss1", "loss2", "loss3", "kdist", "aug", "sim", "rica")


class MetricLogger:
    def __init__(self, jsonl_path: str | None = None, echo: bool = True):
        self.jsonl_path = jsonl_path
        self.echo = echo
        self.history: list[dict[str, Any]] = []
        self._t0 = time.perf_counter()
        if jsonl_path:
            open(jsonl_path, "w").close()

    def log_step(
        self, epoch: int, it: int, metrics: dict[str, Any], patches: int | None = None
    ) -> None:
        """``metrics`` values may be [nadmm]-stacked arrays from the jitted step."""
        stacked = {k: np.atleast_1d(np.asarray(v)) for k, v in metrics.items()}
        nadmm = len(next(iter(stacked.values())))
        now = time.perf_counter()
        for admm in range(nadmm):
            vals = [float(stacked[k][admm]) for k in _ORDER if k in stacked]
            if self.echo:
                print(f"{epoch} {it} {admm} " + " ".join(f"{v:f}" for v in vals))
        rec = {
            "epoch": epoch,
            "iter": it,
            "t": now - self._t0,
            **{k: float(v[-1]) for k, v in stacked.items()},
        }
        if patches:
            rec["patches"] = patches
        self.history.append(rec)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def summary(self) -> dict[str, float]:
        if not self.history:
            return {}
        last = self.history[-1]
        return {k: v for k, v in last.items() if isinstance(v, float)}

    def plot(self, path: str, terms: tuple[str, ...] = _ORDER + ("loss",)) -> None:
        """Loss-curve figure over training iterations (the reference's
        figures/errors.png artifact, generated instead of hand-assembled)."""
        from lshm_tpu.utils.rgb import headless_matplotlib

        headless_matplotlib()
        import matplotlib.pyplot as plt

        if not self.history:
            return
        fig, ax = plt.subplots(figsize=(9, 5))
        xs = np.arange(len(self.history))
        for k in terms:
            ys = [h.get(k) for h in self.history]
            if any(y is not None for y in ys):
                ax.plot(xs, [y if y is not None else np.nan for y in ys], label=k)
        ax.set_xlabel("logged step")
        ax.set_ylabel("loss")
        ax.set_yscale("log")
        ax.legend(ncol=3, fontsize=8)
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
