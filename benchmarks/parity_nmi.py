"""Cluster-assignment parity (NMI) against the reference implementation.

Protocol (the BASELINE.md "cluster parity NMI >= 0.95" metric, made hermetic):
1. instantiate the reference's torch models (read-only from /root/reference/src) at
   reduced dimensions and train them briefly with Adam on patches from the synthetic H5;
2. save reference-format .model checkpoints, import them with lshm_tpu.utils.torch_import;
3. evaluate per-baseline cluster assignments BOTH ways — the reference's own
   eval math in torch (argmin_k mean_n ||Mu_n - m_k||^p; reference:
   src/evaluate_clustering.py:111-119) and our batched evaluator;
4. report NMI between the two assignment vectors (1.0 = identical clustering).

Usage: python benchmarks/parity_nmi.py [--iters 30]
Prints one JSON line {"nmi": ..., "n_baselines": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

REF = "/root/reference/src"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms


def main(iters: int = 30, seed: int = 0):
    import numpy as np
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")  # parity check runs hermetically on host

    _stub_torchvision()
    sys.path.insert(0, REF)
    import lofar_models as rm  # reference code, read-only

    from lshm_tpu.config import DataConfig, ModelConfig
    from lshm_tpu.data import MinibatchSampler
    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.data.h5io import read_baseline_patches, read_metadata
    from lshm_tpu.eval import baseline_distance_matrix, nmi
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.utils.torch_import import convert_autoencoder, convert_khm

    torch.manual_seed(seed)
    L, Lt, Kc, Khp = 24, 8, 4, 4
    scales = torch.tensor([1e-4, 1e-3, 1e-2, 1e-1])

    with tempfile.TemporaryDirectory() as tmp:
        h5 = write_synthetic_h5(
            os.path.join(tmp, "L000001.MS_extract.h5"), nstations=5,
            ntime=192, nfreq=192, seed=seed,
        )

        # ---- 1. brief reference training (Adam on recon + KHM terms) -----------------
        net = rm.AutoEncoderCNN2(latent_dim=L, channels=4, harmonic_scales=scales, rica=True)
        netT = rm.AutoEncoder1DCNN(latent_dim=Lt, channels=4, harmonic_scales=scales, rica=True)
        netF = rm.AutoEncoder1DCNN(latent_dim=Lt, channels=4, harmonic_scales=scales, rica=True)
        mod = rm.Kmeans(latent_dim=L + 2 * Lt, K=Kc, p=Khp)
        params = (list(net.parameters()) + list(netT.parameters())
                  + list(netF.parameters()) + list(mod.parameters()))
        opt = torch.optim.Adam(params, lr=1e-3)
        criterion = torch.nn.MSELoss(reduction="sum")
        sampler = MinibatchSampler([h5], ["0"], DataConfig(batch_size=3, patch_size=128),
                                   seed=seed)
        for i in range(iters):
            mb = sampler.sample()
            x = torch.from_numpy(mb.x.transpose(0, 3, 1, 2).copy())
            uv = torch.from_numpy(mb.uv.copy())
            opt.zero_grad()
            x1, mu = net(x, uv)
            x11 = (x - x1) / 2
            yyT, muT = netT(torch.flatten(x11, 2, 3), uv)
            yyF, muF = netF(torch.flatten(torch.transpose(x11, 2, 3), 2, 3), uv)
            xrecon = x1 + yyT.view_as(x11) + torch.transpose(yyF.view_as(x11), 2, 3)
            Mu = torch.cat((mu, muT, muF), 1)
            loss = (criterion(xrecon, x) / x.numel()
                    + 0.01 * mod.clustering_error(Mu) + 0.01 * mod.cluster_similarity())
            loss.backward()
            opt.step()

        # spread centroids onto actual latents from distinct baselines (k-means-style
        # init) so the assignment vector is non-trivial and NMI is a meaningful test
        with torch.no_grad():
            seeds = []
            for nb in range(Kc):
                _, _, patches, uvp = read_baseline_patches(h5, "0", nb, 128, 4, uvdist=True)
                x = torch.from_numpy(patches.transpose(0, 3, 1, 2).copy())
                uvt = torch.from_numpy(uvp.copy())
                x1, mu = net(x, uvt)
                x11 = (x - x1) / 2
                _, muT = netT(torch.flatten(x11, 2, 3), uvt)
                _, muF = netF(torch.flatten(torch.transpose(x11, 2, 3), 2, 3), uvt)
                seeds.append(torch.cat((mu, muT, muF), 1)[0])
            mod.M.copy_(torch.stack(seeds))

        # ---- 2. save + import ---------------------------------------------------------
        paths = {}
        for name, m in [("net", net), ("netT", netT), ("netF", netF), ("khm", mod)]:
            p = os.path.join(tmp, f"{name}.model")
            torch.save({"model_state_dict": m.state_dict()}, p)
            paths[name] = p
        sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
        our_params = {
            "params": {
                "ae2d": convert_autoencoder(sd(net), 2, rica=True),
                "aeT": convert_autoencoder(sd(netT), 1, rica=True),
                "aeF": convert_autoencoder(sd(netF), 1, rica=True),
                "khm": convert_khm(sd(mod)),
            }
        }

        # ---- 3. assignments both ways --------------------------------------------------
        nbase = read_metadata(h5, "0")[0]
        ref_assign = np.zeros(nbase, np.int64)
        with torch.no_grad():
            for nb in range(nbase):
                _, _, patches, uvp = read_baseline_patches(h5, "0", nb, 128, 4, uvdist=True)
                x = torch.from_numpy(patches.transpose(0, 3, 1, 2).copy())
                uvt = torch.from_numpy(uvp.copy())
                x1, mu = net(x, uvt)
                x11 = (x - x1) / 2
                _, muT = netT(torch.flatten(x11, 2, 3), uvt)
                _, muF = netF(torch.flatten(torch.transpose(x11, 2, 3), 2, 3), uvt)
                Mu = torch.cat((mu, muT, muF), 1)
                dist = torch.stack([
                    (torch.linalg.norm(Mu - mod.M[k], dim=1) ** Khp).mean()
                    for k in range(Kc)
                ])
                ref_assign[nb] = int(dist.argmin())

        model = CascadedAE(cfg=ModelConfig(latent_dim=L, latent_dim_1d=Lt,
                                           num_clusters=Kc, khm_order=Khp, rica=True))
        X, _ = baseline_distance_matrix(model, our_params, h5, "0", order=Khp)
        our_assign = np.argmin(X, axis=0)

        score = nmi(ref_assign, our_assign)
        agree = float((ref_assign == our_assign).mean())
        print(json.dumps({
            "nmi": round(score, 4),
            "exact_agreement": round(agree, 4),
            "n_baselines": int(nbase),
            "ref_hist": np.bincount(ref_assign, minlength=Kc).tolist(),
            "our_hist": np.bincount(our_assign, minlength=Kc).tolist(),
        }))
        return score


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    main(a.iters, a.seed)
