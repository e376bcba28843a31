"""Measure the PyTorch reference's training throughput to establish the bench denominator.

The reference publishes no numbers (SURVEY.md §6), so we execute its actual model/optimizer
code READ-ONLY from /root/reference/src (torchvision, which is absent from this image and
unused on the hot path, is stubbed) and time the unit of work both frameworks share: one
ADMM inner iteration = closure forward+backward of the 3-AE cascade with all loss terms
+ one Adam step + the Lagrange-dual forward/update, at the reference's flagship dimensions
(L=224, Lt=16, K=10, rica; reference: src/kharmonic_lofar.py:25-57).

Writes benchmarks/reference_baseline.json: {"patches_per_sec": ..., "hardware": "cpu", ...}.

Usage: python benchmarks/measure_reference.py [--batch 48] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REF = "/root/reference/src"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.utils = types.ModuleType("torchvision.utils")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = tv.utils


def measure(batch_patches: int = 48, iters: int = 3, nbaselines: int = 12,
            optimizer: str = "adam") -> dict:
    """``optimizer``: "adam" (one closure per ADMM iter) or "lbfgs" (the reference's
    LBFGSNew with Armijo line search, batch mode — many closure evals per step;
    reference: src/kharmonic_lofar.py:93)."""
    import torch

    torch.manual_seed(0)
    _stub_torchvision()
    sys.path.insert(0, REF)
    import lofar_models as ref_models  # reference code, read-only  # noqa: E402

    L, Lt, Kc, Khp = 224, 16, 10, 4
    alpha = beta = gamma = 0.01
    rho = 1.0
    rica_lambda = 0.01
    scales = torch.tensor([1e-4, 1e-3, 1e-2, 1e-1])

    net = ref_models.AutoEncoderCNN2(latent_dim=L, channels=4, harmonic_scales=scales, rica=True)
    netT = ref_models.AutoEncoder1DCNN(latent_dim=Lt, channels=4, harmonic_scales=scales, rica=True)
    netF = ref_models.AutoEncoder1DCNN(latent_dim=Lt, channels=4, harmonic_scales=scales, rica=True)
    mod = ref_models.Kmeans(latent_dim=L + 2 * Lt, K=Kc, p=Khp)

    params = list(net.parameters()) + list(netT.parameters()) + list(netF.parameters()) + list(mod.parameters())
    if optimizer == "adam":
        opt = torch.optim.Adam(params, lr=1e-4)
    else:
        from lbfgsnew import LBFGSNew  # reference optimizer, read-only

        opt = LBFGSNew(params, history_size=7, max_iter=4,
                       line_search_fn=True, batch_mode=True)
    criterion = torch.nn.MSELoss(reduction="sum")

    ppb = batch_patches // nbaselines
    x = torch.randn(batch_patches, 4, 128, 128)
    uv = torch.randn(nbaselines, 2).repeat_interleave(ppb, dim=0)
    y1 = torch.zeros(x.numel())
    y2 = torch.zeros(x.numel())
    y3 = torch.zeros(x.numel())

    def intra_group_pull(Mu):
        # the reference's augmentation loss formula (documented in SURVEY.md §2:
        # sum over per-baseline groups of sum_{i<j} exp(-zhat_i . zhat_j) / P, / (B*P))
        total = torch.zeros(())
        for b in range(nbaselines):
            Z = Mu[b * ppb : (b + 1) * ppb]
            Zn = Z / (Z.norm(dim=1, keepdim=True) + 1e-6)
            G = Zn @ Zn.T
            iu = torch.triu_indices(ppb, ppb, offset=1)
            total = total + torch.exp(-G[iu[0], iu[1]]).sum() / ppb
        return total / (nbaselines * ppb)

    def closure():
        if torch.is_grad_enabled():
            opt.zero_grad()
        x1, mu = net(x, uv)
        x11 = (x - x1) / 2
        yyT, muT = netT(torch.flatten(x11, 2, 3), uv)
        x2 = yyT.view_as(x11)
        yyF, muF = netF(torch.flatten(torch.transpose(x11, 2, 3), 2, 3), uv)
        x3 = torch.transpose(yyF.view_as(x11), 2, 3)
        xrecon = x1 + x2 + x3
        numel = x.numel()
        loss0 = criterion(xrecon, x) / numel
        loss1 = (torch.dot(y1, (x - x1).reshape(-1)) + rho / 2 * criterion(x, x1)) / numel
        loss2 = (torch.dot(y2, (x11 - x2).reshape(-1)) + rho / 2 * criterion(x11, x2)) / numel
        loss3 = (torch.dot(y3, (x11 - x3).reshape(-1)) + rho / 2 * criterion(x11, x3)) / numel
        Mu = torch.cat((mu, muT, muF), 1)
        kdist = alpha * mod.clustering_error(Mu)        # reference Python-loop loss
        sim = beta * mod.cluster_similarity()           # reference Python-loop loss
        aug = gamma * intra_group_pull(Mu)
        rica = rica_lambda * (
            torch.log(torch.cosh(mu)).sum() / mu.numel()
            + torch.log(torch.cosh(muT)).sum() / muT.numel()
            + torch.log(torch.cosh(muF)).sum() / muF.numel()
        )
        loss = loss0 + loss1 + loss2 + loss3 + kdist + sim + aug + rica
        if loss.requires_grad:
            loss.backward()
        return loss

    def one_admm_iter():
        if optimizer == "adam":
            loss = closure()
            opt.step()
        else:
            loss = opt.step(closure)
        # dual update (no-grad forward)
        with torch.no_grad():
            x1, _ = net(x, uv)
            x11 = (x - x1) / 2
            yyT, _ = netT(torch.flatten(x11, 2, 3), uv)
            x2 = yyT.view_as(x11)
            yyF, _ = netF(torch.flatten(torch.transpose(x11, 2, 3), 2, 3), uv)
            x3 = torch.transpose(yyF.view_as(x11), 2, 3)
            y1.add_(rho * (x - x1).reshape(-1))
            y2.add_(rho * (x11 - x2).reshape(-1))
            y3.add_(rho * (x11 - x3).reshape(-1))
        return float(loss)

    one_admm_iter()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_admm_iter()
    dt = (time.perf_counter() - t0) / iters

    return {
        "patches_per_sec": batch_patches / dt,
        "sec_per_admm_iter": dt,
        "batch_patches": batch_patches,
        "optimizer": optimizer,
        "hardware": "cpu" + (f"-{os.cpu_count()}core" if os.cpu_count() else ""),
        # honest-denominator bookkeeping (VERDICT round 2 item 3): record the actual
        # torch threading so per-chip ratios aren't silently per-core ratios
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "torch_version": torch.__version__,
        "framework": "pytorch-reference",
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "lbfgs"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--default-threads", action="store_true",
                    help="write reference_baseline_default_threads.json (torch's "
                         "default threading, unpinned)")
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(__file__),
        "reference_baseline_default_threads.json" if args.default_threads
        else ("reference_baseline.json" if args.optimizer == "adam"
              else "reference_baseline_lbfgs.json"),
    )
    result = measure(args.batch, args.iters, optimizer=args.optimizer)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
