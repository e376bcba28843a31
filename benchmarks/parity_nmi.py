"""Cluster-assignment parity (NMI) against the reference implementation.

Protocol (the BASELINE.md "cluster parity NMI >= 0.95" metric, made hermetic):
1. instantiate the reference's torch models (read-only from /root/reference/src) at
   reduced dimensions and train them briefly with Adam on patches from the synthetic H5;
2. save reference-format .model checkpoints, import them with lshm_tpu.utils.torch_import;
3. evaluate per-baseline cluster assignments BOTH ways — the reference's own
   eval math in torch (argmin_k mean_n ||Mu_n - m_k||^p; reference:
   src/evaluate_clustering.py:111-119) and our batched evaluator;
4. report NMI between the two assignment vectors (1.0 = identical clustering).

Covers BOTH pipelines: the current cascade (net/netT/netF/khm) and the legacy
Fourier variant (net/fnet/khm; reference: Demo.ipynb cells 6 & 10).

Usage: python benchmarks/parity_nmi.py [--iters 30] [--nstations 10]
       [--variant cascade|fourier|both] [--write-report]
Prints one JSON line per variant {"variant": ..., "nmi": ..., "n_baselines": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

REF = "/root/reference/src"
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
REPORT = os.path.join(HERE, "parity_nmi_report.json")


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms


def _setup():
    import jax

    jax.config.update("jax_platforms", "cpu")  # parity check runs hermetically on host
    _stub_torchvision()
    sys.path.insert(0, REF)


def _ref_assignments(Mu_fn, M, nbase, Khp):
    """Reference eval math per baseline: argmin_k mean_n ||Mu_n - m_k||^p
    (reference: src/evaluate_clustering.py:111-119)."""
    import numpy as np
    import torch

    Kc = M.shape[0]
    out = np.zeros(nbase, np.int64)
    with torch.no_grad():
        for nb in range(nbase):
            Mu = Mu_fn(nb)
            dist = torch.stack([
                (torch.linalg.norm(Mu - M[k], dim=1) ** Khp).mean()
                for k in range(Kc)
            ])
            out[nb] = int(dist.argmin())
    return out


def _result(variant, ref_assign, our_assign, Kc):
    import numpy as np

    from lshm_tpu.eval import nmi

    score = nmi(ref_assign, our_assign)
    return score, {
        "variant": variant,
        "nmi": round(score, 4),
        "exact_agreement": round(float((ref_assign == our_assign).mean()), 4),
        "n_baselines": int(len(ref_assign)),
        "ref_hist": np.bincount(ref_assign, minlength=Kc).tolist(),
        "our_hist": np.bincount(our_assign, minlength=Kc).tolist(),
    }


def run_cascade(iters: int = 30, seed: int = 0, nstations: int = 10):
    """Current pipeline: net/netT/netF/khm (reference: src/kharmonic_lofar.py)."""
    import numpy as np
    import torch

    _setup()
    import lofar_models as rm  # reference code, read-only

    from lshm_tpu.config import DataConfig, ModelConfig
    from lshm_tpu.data import MinibatchSampler
    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.data.h5io import read_baseline_patches, read_metadata
    from lshm_tpu.eval import baseline_distance_matrix
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.utils.torch_import import convert_autoencoder, convert_khm

    torch.manual_seed(seed)
    L, Lt, Kc, Khp = 24, 8, 4, 4
    scales = torch.tensor([1e-4, 1e-3, 1e-2, 1e-1])

    with tempfile.TemporaryDirectory() as tmp:
        h5 = write_synthetic_h5(
            os.path.join(tmp, "L000001.MS_extract.h5"), nstations=nstations,
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

        def fwd(x, uv):
            x1, mu = net(x, uv)
            x11 = (x - x1) / 2
            yyT, muT = netT(torch.flatten(x11, 2, 3), uv)
            yyF, muF = netF(torch.flatten(torch.transpose(x11, 2, 3), 2, 3), uv)
            xrecon = x1 + yyT.view_as(x11) + torch.transpose(yyF.view_as(x11), 2, 3)
            return xrecon, torch.cat((mu, muT, muF), 1)

        for i in range(iters):
            mb = sampler.sample()
            x = torch.from_numpy(mb.x.transpose(0, 3, 1, 2).copy())
            uv = torch.from_numpy(mb.uv.copy())
            opt.zero_grad()
            xrecon, Mu = fwd(x, uv)
            loss = (criterion(xrecon, x) / x.numel()
                    + 0.01 * mod.clustering_error(Mu) + 0.01 * mod.cluster_similarity())
            loss.backward()
            opt.step()

        # spread centroids onto actual latents from distinct baselines (k-means-style
        # init) so the assignment vector is non-trivial and NMI is a meaningful test
        def baseline_Mu(nb):
            _, _, patches, uvp = read_baseline_patches(h5, "0", nb, 128, 4, uvdist=True)
            x = torch.from_numpy(patches.transpose(0, 3, 1, 2).copy())
            uvt = torch.from_numpy(uvp.copy())
            return fwd(x, uvt)[1]

        with torch.no_grad():
            mod.M.copy_(torch.stack([baseline_Mu(nb)[0] for nb in range(Kc)]))

        # ---- 2. save + import ---------------------------------------------------------
        for name, m in [("net", net), ("netT", netT), ("netF", netF), ("khm", mod)]:
            torch.save({"model_state_dict": m.state_dict()},
                       os.path.join(tmp, f"{name}.model"))
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
        ref_assign = _ref_assignments(baseline_Mu, mod.M, nbase, Khp)

        model = CascadedAE(cfg=ModelConfig(latent_dim=L, latent_dim_1d=Lt,
                                           num_clusters=Kc, khm_order=Khp, rica=True))
        X, _ = baseline_distance_matrix(model, our_params, h5, "0", order=Khp)
        our_assign = __import__("numpy").argmin(X, axis=0)

        return _result("cascade", ref_assign, our_assign, Kc)


def run_fourier(iters: int = 30, seed: int = 0, nstations: int = 10):
    """Legacy Fourier pipeline: net/fnet/khm — second 2D AE on the shifted FFT of the
    residual (reference: Demo.ipynb cells 6 & 10, src/EvaluateClusters.ipynb cells
    8 & 18, with the current reference module signatures)."""
    import numpy as np
    import torch

    _setup()
    import lofar_models as rm  # reference code, read-only

    from lshm_tpu.config import DataConfig, ModelConfig
    from lshm_tpu.data import MinibatchSampler
    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.data.h5io import read_baseline_patches, read_metadata
    from lshm_tpu.eval import baseline_distance_matrix
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.utils.torch_import import convert_autoencoder, convert_khm

    torch.manual_seed(seed)
    L, LF, Kc, Khp = 24, 12, 4, 4
    scales = torch.tensor([1e-4, 1e-3, 1e-2, 1e-1])

    with tempfile.TemporaryDirectory() as tmp:
        h5 = write_synthetic_h5(
            os.path.join(tmp, "L000001.MS_extract.h5"), nstations=nstations,
            ntime=192, nfreq=192, seed=seed,
        )

        net = rm.AutoEncoderCNN2(latent_dim=L, channels=4, harmonic_scales=scales, rica=True)
        fnet = rm.AutoEncoderCNN2(latent_dim=LF, channels=8, harmonic_scales=scales, rica=True)
        mod = rm.Kmeans(latent_dim=L + LF, K=Kc, p=Khp)
        params = (list(net.parameters()) + list(fnet.parameters())
                  + list(mod.parameters()))
        opt = torch.optim.Adam(params, lr=1e-3)
        criterion = torch.nn.MSELoss(reduction="sum")
        sampler = MinibatchSampler([h5], ["0"], DataConfig(batch_size=3, patch_size=128),
                                   seed=seed)

        def fwd(x, uv):
            x1, mu = net(x, uv)
            fftx = torch.fft.fftn(x - x1, dim=(2, 3), norm="ortho")
            fftx = torch.fft.fftshift(fftx, dim=(2, 3))
            y = torch.cat((fftx.real, fftx.imag), 1).clamp(min=-10, max=10)
            yhat, ymu = fnet(y, uv)
            return y, yhat, torch.cat((mu, ymu), 1)

        for i in range(iters):
            mb = sampler.sample()
            x = torch.from_numpy(mb.x.transpose(0, 3, 1, 2).copy())
            uv = torch.from_numpy(mb.uv.copy())
            opt.zero_grad()
            y, yhat, Mu = fwd(x, uv)
            loss = (criterion(yhat, y) / y.numel()
                    + 0.01 * mod.clustering_error(Mu) + 0.01 * mod.cluster_similarity())
            loss.backward()
            opt.step()

        def baseline_Mu(nb):
            _, _, patches, uvp = read_baseline_patches(h5, "0", nb, 128, 4, uvdist=True)
            x = torch.from_numpy(patches.transpose(0, 3, 1, 2).copy())
            uvt = torch.from_numpy(uvp.copy())
            return fwd(x, uvt)[2]

        with torch.no_grad():
            mod.M.copy_(torch.stack([baseline_Mu(nb)[0] for nb in range(Kc)]))

        for name, m in [("net", net), ("fnet", fnet), ("khm", mod)]:
            torch.save({"model_state_dict": m.state_dict()},
                       os.path.join(tmp, f"{name}.model"))
        sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
        our_params = {
            "params": {
                "ae2d": convert_autoencoder(sd(net), 2, rica=True),
                "aef": convert_autoencoder(sd(fnet), 2, rica=True),
                "khm": convert_khm(sd(mod)),
            }
        }

        nbase = read_metadata(h5, "0")[0]
        ref_assign = _ref_assignments(baseline_Mu, mod.M, nbase, Khp)

        model = CascadedAE(cfg=ModelConfig(
            latent_dim=L, latent_dim_fourier=LF, num_clusters=Kc, khm_order=Khp,
            rica=True, fourier_variant=True,
        ))
        X, _ = baseline_distance_matrix(model, our_params, h5, "0", order=Khp)
        our_assign = np.argmin(X, axis=0)

        return _result("fourier", ref_assign, our_assign, Kc)


def main(iters: int = 30, seed: int = 0, nstations: int = 10,
         variant: str = "cascade", write_report: bool = False):
    runners = {"cascade": [run_cascade], "fourier": [run_fourier],
               "both": [run_cascade, run_fourier]}[variant]
    results = []
    score = 1.0
    for run in runners:
        s, r = run(iters, seed, nstations)
        score = min(score, s)
        results.append(r)
        print(json.dumps(r), flush=True)
    if write_report:
        import time

        with open(REPORT, "w") as f:
            json.dump({
                "results": results,
                "protocol": "benchmarks/parity_nmi.py: reference torch models briefly "
                            "trained, checkpoints imported via lshm_tpu.utils."
                            "torch_import, per-baseline cluster assignments computed "
                            "by the reference's own eval math AND our batched "
                            "evaluator, NMI between the two; both the current cascade "
                            "and the legacy Fourier pipeline",
                "date": time.strftime("%Y-%m-%d"),
                "code_version": "round 4",
            }, f, indent=1)
    return score


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nstations", type=int, default=10,
                    help="10 stations -> 55 baselines incl. autocorrelations")
    ap.add_argument("--variant", choices=["cascade", "fourier", "both"],
                    default="both")
    ap.add_argument("--write-report", action="store_true")
    a = ap.parse_args()
    main(a.iters, a.seed, a.nstations, a.variant, a.write_report)
