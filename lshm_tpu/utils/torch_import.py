"""Import reference PyTorch checkpoints into LSHM-TPU params.

The reference saves four files — ``net.model`` (2D AE), ``netT.model`` / ``netF.model``
(1D AEs), ``khm.model`` (centroids) — each ``{'model_state_dict': OrderedDict}``
(reference: src/kharmonic_lofar.py:210-222).  This module converts them into the Flax
param pytree of ``CascadedAE`` so reference-trained models evaluate unchanged in this
framework (the cluster-parity path in BASELINE.md).

Layout mapping (numerically verified against torch.nn.functional in tests):
- Conv:           flax HWIO kernel = torch OIHW weight.transpose(2, 3, 1, 0)
- ConvTranspose:  flax HWIO kernel = torch IOHW weight.transpose(2, 3, 0, 1) flipped
                  along every spatial axis (lax.conv_transpose does not flip kernels)
- Dense:          flax [in, out] kernel = torch [out, in] weight.T
- Bottleneck:     torch flattens NCHW (c, h, w); we flatten NHWC (h, w, c) — the first
                  768 input rows of fc1 and the 768 output cols of fc3 are permuted.
"""

from __future__ import annotations

import numpy as np

_C_LADDER = (8, 12, 24, 48, 96, 192)


def _dense(sd: dict, name: str) -> dict:
    return {
        "kernel": np.asarray(sd[f"{name}.weight"]).T.copy(),
        "bias": np.asarray(sd[f"{name}.bias"]).copy(),
    }


def _conv(sd: dict, name: str, ndim: int) -> dict:
    w = np.asarray(sd[f"{name}.weight"])  # torch conv: [out, in, *k]
    if ndim == 2:
        k = w.transpose(2, 3, 1, 0)
    else:
        k = w.transpose(2, 1, 0)
    return {"kernel": k.copy(), "bias": np.asarray(sd[f"{name}.bias"]).copy()}


def _tconv(sd: dict, name: str, ndim: int) -> dict:
    w = np.asarray(sd[f"{name}.weight"])  # torch tconv: [in, out, *k]
    if ndim == 2:
        k = w.transpose(2, 3, 0, 1)[::-1, ::-1]
    else:
        k = w.transpose(2, 0, 1)[::-1]
    return {"kernel": k.copy(), "bias": np.asarray(sd[f"{name}.bias"]).copy()}


def _bottleneck_perm(ndim: int) -> np.ndarray:
    """perm[our_index] = torch_index for the 768-dim bottleneck flatten."""
    C = _C_LADDER[-1]
    if ndim == 2:
        # ours: (h, w, c) h,w in [0,2); torch: (c, h, w)
        perm = np.empty(4 * C, np.int64)
        for h in range(2):
            for w in range(2):
                for c in range(C):
                    perm[h * 2 * C + w * C + c] = c * 4 + h * 2 + w
        return perm
    # 1D — ours: (pos, c), pos in [0,4); torch: (c, pos)
    perm = np.empty(4 * C, np.int64)
    for p in range(4):
        for c in range(C):
            perm[p * C + c] = c * 4 + p
    return perm


def convert_autoencoder(sd: dict, ndim: int, rica: bool) -> dict:
    """Reference AutoEncoderCNN2/AutoEncoder1DCNN state_dict -> flax AutoEncoder param
    subtree (reference module layout: src/lofar_models.py:31-57,115-142)."""
    perm = _bottleneck_perm(ndim)
    out: dict = {}
    for i in range(6):
        out[f"conv{i}"] = _conv(sd, f"conv{i}", ndim)
        out[f"tconv{i}"] = _tconv(sd, f"tconv{i}", ndim)
    out["fcuv1"] = _dense(sd, "fcuv1")
    out["fcuv3"] = _dense(sd, "fcuv3")

    fc1 = _dense(sd, "fc1")  # kernel [768 + harmonic, L]
    k = fc1["kernel"].copy()
    k[: len(perm)] = fc1["kernel"][perm]
    out["fc1"] = {"kernel": k, "bias": fc1["bias"]}

    fc3 = _dense(sd, "fc3")  # kernel [L + harmonic, 768]; our column j = torch column perm[j]
    out["fc3"] = {"kernel": fc3["kernel"][:, perm], "bias": fc3["bias"][perm]}

    if rica:
        out["fc2in"] = _dense(sd, "fc2in")
        out["fc2out"] = _dense(sd, "fc2out")
    return out


def convert_khm(sd: dict) -> dict:
    return {"M": np.asarray(sd["M"]).copy()}


def _load_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model_state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def load_reference_checkpoints(
    net_path: str, netT_path: str, netF_path: str, khm_path: str, rica: bool = True
) -> dict:
    """Build the full CascadedAE params pytree from the reference's four .model files."""
    return {
        "params": {
            "ae2d": convert_autoencoder(_load_state_dict(net_path), 2, rica),
            "aeT": convert_autoencoder(_load_state_dict(netT_path), 1, rica),
            "aeF": convert_autoencoder(_load_state_dict(netF_path), 1, rica),
            "khm": convert_khm(_load_state_dict(khm_path)),
        }
    }


def load_reference_checkpoints_fourier(
    net_path: str, fnet_path: str, khm_path: str, rica: bool = True
) -> dict:
    """Build the legacy-Fourier CascadedAE params pytree from the notebook-era trio
    ``net.model`` / ``fnet.model`` / ``khm.model`` (reference: Demo.ipynb cell 6 —
    the published models.zip ships exactly these three files)."""
    return {
        "params": {
            "ae2d": convert_autoencoder(_load_state_dict(net_path), 2, rica),
            "aef": convert_autoencoder(_load_state_dict(fnet_path), 2, rica),
            "khm": convert_khm(_load_state_dict(khm_path)),
        }
    }
