"""Generate examples/Evaluate.ipynb — the in-depth clustering-evaluation notebook,
the analog of the reference's src/EvaluateClusters.ipynb cells 8-28 (centroid
inspection, per-baseline distance matrix, average cluster distance, t-SNE +
agglomerative hard clustering, per-cluster spectrogram montage grids, reconstruction
panels), built on the synthetic fixture so it executes top-to-bottom hermetically.

Run ``python examples/make_evaluate_notebook.py --execute`` to (re)write + execute.
"""

from __future__ import annotations

import argparse
import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "Evaluate.ipynb")


def md(s):
    return nbf.v4.new_markdown_cell(s.strip())


def code(s):
    return nbf.v4.new_code_cell(s.strip())


CELLS = [
    md("""
# LSHM-TPU: Evaluating the clusters

In-depth clustering evaluation — the equivalent of the reference's
`src/EvaluateClusters.ipynb` (cells 8–28): inspect the learned centroids, build the
per-baseline cluster-distance matrix, find the detected/absent feature clusters,
project with t-SNE, hard-cluster agglomeratively, and look at what each cluster's
spectrograms and reconstructions actually contain.

Runs hermetically: a synthetic observation is generated and a small cascade trained
in the first cells (on real data you would instead `Trainer.load()` a checkpoint or
`import-torch` the reference's `.model` files).
"""),
    code("""
%matplotlib inline
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.getcwd())) if os.path.basename(os.getcwd()) == "examples" else None
os.environ.setdefault("LSHM_PLATFORM", "cpu")   # hermetic CPU run; delete for TPU

import numpy as np
import matplotlib.pyplot as plt
import jax

if os.environ.get("LSHM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LSHM_PLATFORM"])

OUT = tempfile.mkdtemp(prefix="lshm_eval_")
print("artifacts →", OUT, "| backend:", jax.default_backend())
"""),
    md("""
## 1. Data + a quickly-trained model

Synthetic observation (15 baselines with distinct per-baseline fringe physics) and a
short ADMM training run at small dims — enough structure for the evaluation plots to
mean something. With real data, replace this cell with a checkpoint load
(`trainer.load(ckpt_dir)`) or the torch importer.
"""),
    code("""
import dataclasses
from lshm_tpu.config import (DataConfig, LBFGSConfig, ModelConfig, OptimConfig,
                             RampStage, TrainConfig, preset)
from lshm_tpu.data.synthetic import write_synthetic_h5
from lshm_tpu.data.h5io import read_metadata
from lshm_tpu.train.trainer import Trainer
from lshm_tpu.utils.metrics import MetricLogger

data_dir = os.path.join(OUT, "data")
h5 = write_synthetic_h5(os.path.join(data_dir, "L000001.MS_extract.h5"),
                        nstations=5, ntime=192, nfreq=192, seed=3)
nbase = read_metadata(h5, "0")[0]
KC, KO = 4, 3         # soft KHM clusters / final hard clusters (reference Kc=10, Ko=10)

cfg = preset("full_khm").replace(
    data=DataConfig(data_dir=data_dir, batch_size=3),
    model=ModelConfig(latent_dim=32, latent_dim_1d=8, num_clusters=KC),
    optim=OptimConfig(optimizer="adam", lbfgs=LBFGSConfig(max_iter=2, history_size=5)),
    train=TrainConfig(num_epochs=2, iters_per_epoch=3, admm_iters=3,
                      checkpoint_dir=os.path.join(OUT, "ckpt"),
                      ramp=(RampStage(epochs=1, alpha=0.001, beta=0.001, gamma=0.001,
                                      optimizer="adam"),
                            RampStage(epochs=1, alpha=0.01, beta=0.01, gamma=0.01,
                                      optimizer="lbfgs"))),
)
logger = MetricLogger(echo=False)
trainer = Trainer(cfg, logger)
trainer.run()
print(f"{nbase} baselines; trained:", {k: round(v, 4) for k, v in logger.summary().items()})
"""),
    md("""
## 2. The learned centroids

The KHM head's centroid matrix `M ∈ R^{K×D}` over the concatenated latent (2D ⊕ two
1D latents). The reference dumps it as `M.png`/`M.mat` (evaluate_clustering.py:61-64);
here: a heatmap plus pairwise centroid cosine similarity — the quantity the
cluster-similarity penalty pushed apart during training.
"""),
    code("""
M = np.asarray(trainer.params["params"]["khm"]["M"])
fig, axes = plt.subplots(1, 2, figsize=(12, 3.2))
im = axes[0].imshow(M, aspect="auto", cmap="RdBu_r")
axes[0].set_xlabel("latent dim"); axes[0].set_ylabel("centroid k")
axes[0].set_title(f"centroids M {M.shape}"); fig.colorbar(im, ax=axes[0])
Mn = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
im = axes[1].imshow(Mn @ Mn.T, vmin=-1, vmax=1, cmap="RdBu_r")
axes[1].set_title("pairwise centroid cosine similarity"); fig.colorbar(im, ax=axes[1])
plt.show()
"""),
    md("""
## 3. Per-baseline distance matrix

`X[k, b] = mean_n ‖Mu_n − m_k‖₂ᵖ` over baseline *b*'s patches, then row-demeaned
(reference: evaluate_clustering.py:111-123). Device-side: the forwards run as jitted
batches with the host decode pipelined two chunks ahead. Low values = that cluster's
feature is detected in that baseline.
"""),
    code("""
from lshm_tpu.eval import evaluate_sap

res = evaluate_sap(trainer.model, trainer.params, h5, "0",
                   num_hard_clusters=KO, out_dir=os.path.join(OUT, "eval"),
                   montages=False)
fig, axes = plt.subplots(1, 2, figsize=(12, 3.4))
im = axes[0].imshow(res.X, aspect="auto", cmap="viridis")
axes[0].set_xlabel("baseline"); axes[0].set_ylabel("cluster k")
axes[0].set_title("row-demeaned distance matrix X"); fig.colorbar(im, ax=axes[0])
axes[1].plot(res.X.mean(axis=1), "o-")
axes[1].set_xlabel("cluster id"); axes[1].set_ylabel("average distance")
axes[1].set_title("detected (low) vs absent (high) feature clusters")
plt.show()
print("soft-assignment histogram:", np.bincount(res.soft_assign, minlength=KC).tolist())
"""),
    md("""
## 4. t-SNE projection and agglomerative hard clustering

Columns of X → t-SNE(2) → StandardScaler → AgglomerativeClustering(average linkage)
(reference: EvaluateClusters.ipynb cells 22 & 25). Left: colored by soft (argmin)
assignment; right: by final hard label.
"""),
    code("""
fig, axes = plt.subplots(1, 2, figsize=(12, 4.2))
for ax, c, name in ((axes[0], res.soft_assign, "soft argmin-distance id"),
                    (axes[1], res.labels, "agglomerative hard label")):
    sc = ax.scatter(res.embedding[:, 0], res.embedding[:, 1], c=c, cmap="Spectral", s=80)
    for b in range(len(c)):
        ax.annotate(str(b), (res.embedding[b, 0], res.embedding[b, 1]),
                    fontsize=7, alpha=0.6)
    ax.set_title(name); fig.colorbar(sc, ax=ax)
plt.show()
"""),
    md("""
## 5. Per-cluster spectrogram montages

What did each hard cluster actually group? Full (un-patched) spectrograms of every
baseline, arranged per cluster (reference: EvaluateClusters.ipynb cells 27-28 /
evaluate_clustering.py:158-163).
"""),
    code("""
from lshm_tpu.data.h5io import read_baseline_flat
from lshm_tpu.utils.rgb import channel_to_rgb

labels = res.labels
for cl in sorted(set(labels.tolist())):
    members = [b for b in range(nbase) if labels[b] == cl]
    fig, axes = plt.subplots(1, len(members), figsize=(2.2 * len(members), 2.4),
                             squeeze=False)
    for ax, b in zip(axes[0], members):
        img = channel_to_rgb(read_baseline_flat(h5, "0", b, 4)[..., :4])
        ax.imshow(np.asarray(img).clip(-2, 2) * 0.25 + 0.5)
        ax.set_title(f"b{b}", fontsize=8); ax.axis("off")
    fig.suptitle(f"hard cluster {cl}: {len(members)} baselines")
    plt.show()
"""),
    md("""
## 6. Reconstruction panels per cluster exemplar

For one exemplar baseline of each hard cluster: the input patch, the 2D AE
reconstruction, the two 1D AEs' residual reconstructions, the full cascade
reconstruction `x̂₂D + vec⁻¹(x̂_T) + vec⁻¹(x̂_F)`, and the remaining error
(reference: evaluate_clustering.py:81-107).
"""),
    code("""
import jax.numpy as jnp
from lshm_tpu.data.h5io import read_baseline_patches

def to_img(a):
    return np.asarray(channel_to_rgb(np.asarray(a)[..., :4])).clip(-2, 2) * 0.25 + 0.5

for cl in sorted(set(labels.tolist())):
    b = int(np.nonzero(labels == cl)[0][0])
    _, _, patches, uv = read_baseline_patches(h5, "0", b, 128, 4, uvdist=True)
    out = trainer.model.apply(trainer.params, jnp.asarray(patches[:1]), jnp.asarray(uv[:1]))
    x = patches[0]
    panels = [("x", x), ("x̂ 2D", np.asarray(out.x1)[0]),
              ("x̂_T (1D time)", np.asarray(out.x2)[0]),
              ("x̂_F (1D freq)", np.asarray(out.x3)[0]),
              ("x̂ full", np.asarray(out.xrecon)[0]),
              ("error", x - np.asarray(out.xrecon)[0])]
    fig, axes = plt.subplots(1, len(panels), figsize=(2.2 * len(panels), 2.4))
    for ax, (name, img) in zip(axes, panels):
        ax.imshow(to_img(img)); ax.set_title(name, fontsize=8); ax.axis("off")
    fig.suptitle(f"cluster {cl} exemplar: baseline {b}")
    plt.show()
"""),
    md("""
## 7. Exported artifacts

`evaluate_sap(out_dir=...)` also wrote the reference-compatible artifact set —
`X.mat`, `M.mat`, `M.png`, `scatter.png`, `clusters.png` (and per-baseline montage /
recon-panel PNGs with `montages=True` / `recon_panels=True`) — so downstream MATLAB
or reporting tooling keeps working unchanged.
"""),
    code("""
print(sorted(os.listdir(os.path.join(OUT, "eval"))))
"""),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    if args.execute:
        from nbclient import NotebookClient

        client = NotebookClient(nb, timeout=1800, kernel_name="python3",
                                resources={"metadata": {"path": HERE}})
        client.execute()
    with open(args.out, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {args.out} ({len(nb.cells)} cells, executed={args.execute})")


if __name__ == "__main__":
    main()
