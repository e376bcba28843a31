"""Generate examples/Demo.ipynb — the interactive-notebook equivalent of the
reference's Demo.ipynb / src/EvaluateClusters.ipynb (reference: Demo.ipynb cells 2-16;
src/EvaluateClusters.ipynb cells 8-28), built on the synthetic fixture so it executes
top-to-bottom with no external data.

Run ``python examples/make_demo_notebook.py`` to (re)write the notebook;
``--execute`` also runs it via nbclient, storing the outputs inline.
"""

from __future__ import annotations

import argparse
import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "Demo.ipynb")

MD = []
CODE = []


def md(s):
    MD.append(len(MD) + len(CODE))
    return nbf.v4.new_markdown_cell(s.strip())


def code(s):
    CODE.append(len(MD) + len(CODE))
    return nbf.v4.new_code_cell(s.strip())


CELLS = [
    md("""
# LSHM-TPU Demo

End-to-end walkthrough of the TPU-native LOFAR system-health-monitoring framework —
the interactive equivalent of the reference's `Demo.ipynb` / `src/EvaluateClusters.ipynb`
(reference: Demo.ipynb cells 2–16), running hermetically on a synthetic observation:

1. synthesize a schema-valid `MS_extract.h5` observation,
2. inspect the raw visibilities and training patches,
3. train the cascaded 2D+1D autoencoders jointly with the K-harmonic-means head
   (ADMM, the published Adam → L-BFGS ramp),
4. evaluate: per-baseline cluster distances → t-SNE → agglomerative hard clustering,
5. inspect reconstructions,
6. train a line-graph GNN over the learned latents,
7. learn a RICA sparse dictionary.

Small latent dims keep the whole notebook a few minutes on CPU; on a TPU host it runs
as-is (remove `LSHM_PLATFORM`) with the full flagship dims if you like.
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

OUT = tempfile.mkdtemp(prefix="lshm_demo_")
print("artifacts →", OUT, "| backend:", jax.default_backend())
"""),
    md("""
## 1. A synthetic LOFAR observation

The generator plants per-baseline fringe patterns (gains × source at (l,m) × uv
rotation) into the reference H5 schema — int8 visibilities with per-(baseline, freq,
pol) float32 scale factors (reference: src/lofar_tools.py:76-109, the schema the
scanner's validity gate checks at :453).
"""),
    code("""
from lshm_tpu.data.synthetic import write_synthetic_h5
from lshm_tpu.data.h5io import read_metadata, read_baseline_flat
from lshm_tpu.utils.rgb import channel_to_rgb

data_dir = os.path.join(OUT, "data")
h5 = write_synthetic_h5(os.path.join(data_dir, "L000001.MS_extract.h5"),
                        nstations=5, ntime=192, nfreq=192, seed=3)
nbase, ntime, nfreq, npol, reim = read_metadata(h5, "0")
print(f"{nbase} baselines, {ntime}x{nfreq} time x freq, {npol} pols")

fig, axes = plt.subplots(1, 3, figsize=(12, 4))
for ax, b in zip(axes, (0, 3, 7)):
    ax.imshow(channel_to_rgb(read_baseline_flat(h5, "0", b, 4)).clip(-2, 2) * 0.25 + 0.5)
    ax.set_title(f"baseline {b}"); ax.axis("off")
fig.suptitle("raw visibilities (pseudocolor re/im XX, YY)"); plt.show()
"""),
    md("""
## 2. Training patches

The sampler cuts each baseline's spectrogram into overlapping 128×128 patches
(stride 64), decodes int8 × scale on the fly, clamps and z-normalizes globally —
baseline-major, so augmentation groups and uv coordinates stay aligned (the reference
has a patch-major/baseline-major mismatch here; SURVEY.md defect #3).
"""),
    code("""
from lshm_tpu.config import DataConfig
from lshm_tpu.data import MinibatchSampler

dcfg = DataConfig(data_dir=data_dir, batch_size=3, patch_size=128)
mb = MinibatchSampler([h5], ["0"], dcfg, seed=0).sample()
print("minibatch:", mb.x.shape, "uv:", mb.uv.shape,
      "| patches/baseline:", mb.patches_per_baseline)

fig, axes = plt.subplots(1, 4, figsize=(12, 3))
for ax, i in zip(axes, range(0, mb.x.shape[0], mb.patches_per_baseline)):
    ax.imshow(channel_to_rgb(mb.x[i]).clip(-2, 2) * 0.25 + 0.5)
    ax.set_title(f"patch {i}"); ax.axis("off")
plt.show()
"""),
    md("""
## 3. Train the cascade + K-harmonic-means head

Three autoencoders — 2D on the patch, two 1D on the row-/column-vectorized residual —
trained jointly with learnable cluster centroids under an ADMM augmented-Lagrangian
objective (reference: src/kharmonic_lofar.py:115-208). The published recipe (reference
README.md:24-30) ramps α=β=γ and switches Adam → stochastic L-BFGS; here both stages
are config. Every `Nadmm` inner loop is ONE compiled XLA program; with L-BFGS the
line searches run on-device too.
"""),
    code("""
import dataclasses
from lshm_tpu.config import (LBFGSConfig, ModelConfig, OptimConfig, RampStage,
                             TrainConfig, preset)
from lshm_tpu.train.trainer import Trainer
from lshm_tpu.utils.metrics import MetricLogger

cfg = preset("full_khm").replace(
    data=dataclasses.replace(dcfg, batch_size=3),
    model=ModelConfig(latent_dim=32, latent_dim_1d=8, num_clusters=4),
    optim=OptimConfig(optimizer="adam",
                      lbfgs=LBFGSConfig(max_iter=2, history_size=5)),
    train=TrainConfig(
        num_epochs=2, iters_per_epoch=3, admm_iters=3,
        checkpoint_dir=os.path.join(OUT, "ckpt"),
        ramp=(RampStage(epochs=1, alpha=0.001, beta=0.001, gamma=0.001,
                        optimizer="adam"),
              RampStage(epochs=1, alpha=0.01, beta=0.01, gamma=0.01,
                        optimizer="lbfgs")),
    ),
)
logger = MetricLogger(jsonl_path=os.path.join(OUT, "train_log.jsonl"), echo=False)
trainer = Trainer(cfg, logger)
trainer.run()
print("final:", logger.summary())
"""),
    code("""
import json
hist = [json.loads(l) for l in open(os.path.join(OUT, "train_log.jsonl"))]
loss = [h["loss"] for h in hist if "loss" in h]
plt.figure(figsize=(7, 3))
plt.plot(loss); plt.xlabel("ADMM iteration"); plt.ylabel("objective")
plt.title("training objective (stage 1: Adam, stage 2: L-BFGS)"); plt.show()
"""),
    md("""
## 4. Clustering evaluation

Per-baseline mean distance to each centroid `mean_n ‖Mu_n − m_k‖₂ᵖ` → row-demean →
t-SNE(2) → StandardScaler + AgglomerativeClustering (reference:
src/evaluate_clustering.py:75-142). The forward + distance reductions run as jitted
device batches; only t-SNE/agglomerative stay on host.
"""),
    code("""
from lshm_tpu.eval import evaluate_sap

res = evaluate_sap(trainer.model, trainer.params, h5, "0",
                   num_hard_clusters=3, out_dir=os.path.join(OUT, "eval"))
fig, axes = plt.subplots(1, 2, figsize=(11, 4))
im = axes[0].imshow(res.X, aspect="auto", cmap="viridis")
axes[0].set_xlabel("baseline"); axes[0].set_ylabel("cluster k")
axes[0].set_title("row-demeaned distance matrix X"); fig.colorbar(im, ax=axes[0])
if res.embedding is not None:
    axes[1].scatter(res.embedding[:, 0], res.embedding[:, 1],
                    c=res.labels, cmap="Spectral", s=60)
    axes[1].set_title("t-SNE of X columns, agglomerative labels")
plt.show()
print("soft-assignment histogram:", np.bincount(res.soft_assign).tolist())
"""),
    md("""
## 5. Reconstructions

`x ≈ x̂₂D + vec⁻¹(x̂_T) + vec⁻¹(x̂_F)` — the 2D AE reconstruction plus the two 1D AEs'
reconstructions of the residual (reference: src/evaluate_clustering.py:81-91).
"""),
    code("""
import jax.numpy as jnp
from lshm_tpu.data.h5io import read_baseline_patches

_, _, patches, uv = read_baseline_patches(h5, "0", 1, 128, 4, uvdist=True)
out = trainer.model.apply(trainer.params, jnp.asarray(patches[:1]), jnp.asarray(uv[:1]))
panels = [("x", patches[0]), ("xhat 2D", np.asarray(out.x1)[0]),
          ("xrecon", np.asarray(out.xrecon)[0]),
          ("error", patches[0] - np.asarray(out.xrecon)[0])]
fig, axes = plt.subplots(1, 4, figsize=(13, 3.2))
for ax, (name, img) in zip(axes, panels):
    ax.imshow(channel_to_rgb(img[..., :4]).clip(-2, 2) * 0.25 + 0.5)
    ax.set_title(name); ax.axis("off")
plt.show()
"""),
    md("""
## 6. Line-graph GNN over the learned latents

Nodes = baselines (features: mean latent), edges join baselines sharing a station;
2-layer GCN regresses the per-baseline centroid distances (reference:
src/train_graph.py:89-209, segment-sum message passing here).
"""),
    code("""
from lshm_tpu.graph import build_line_graph_data, train_line_graph

gdata = build_line_graph_data(trainer.model, trainer.params, h5, "0")
_, _, glosses = train_line_graph(gdata, hidden=4, epochs=60)
print(f"{gdata.x.shape[0]} nodes, {gdata.edge_index.shape[1]} edges; "
      f"loss {glosses[0]:.4f} → {glosses[-1]:.4f}")
plt.figure(figsize=(6, 2.5)); plt.plot(glosses)
plt.xlabel("epoch"); plt.ylabel("MSE"); plt.title("line-graph GCN"); plt.show()
"""),
    md("""
## 7. RICA sparse dictionary

Linear sparse coding X = A S on flattened patches: S solved per-minibatch by the
jittable stochastic L-BFGS, A updated by one vectorized `E Sᵀ/n` matmul (reference:
src/rica_lofar.py:44-104 — there the dictionary ascent is a Python outer-product
loop).
"""),
    code("""
from lshm_tpu.config import LBFGSConfig
from lshm_tpu.rica import RICAConfig, RICADictionaryLearner

X = RICADictionaryLearner.patches_to_columns(mb.x)
learner = RICADictionaryLearner(
    RICAConfig(input_dim=X.shape[0], dict_size=16,
               solver=LBFGSConfig(max_iter=3, history_size=3, batch_mode=True)))
for i in range(2):
    m = learner.fit_minibatch(X, jax.random.PRNGKey(i))
    print(f"rica iter {i}: loss {m['loss']:.5f}  |dA| {m['dA_norm']:.5f}")

atoms = learner.atoms(channels=4, patch=128)
fig, axes = plt.subplots(2, 4, figsize=(10, 5))
for ax, a in zip(axes.flat, atoms[:8]):
    ax.imshow(channel_to_rgb(a).clip(-2, 2) * 0.25 + 0.5); ax.axis("off")
fig.suptitle("learned dictionary atoms"); plt.show()
"""),
    md("""
## Where to go next

- **Legacy Fourier pipeline** (the reference notebooks' variant — second 2D AE on the
  FFT of the residual): `preset("fourier_cascade")`, or `--fourier` in
  `examples/walkthrough.py`.
- **Real data**: point `DataConfig.data_dir` at a directory of `L*.MS_extract.h5`
  files; the CLI covers every flow —
  `python -m lshm_tpu.cli train|eval|graph|rica|import-torch|export|bench`.
- **Scale out**: `--set train.mesh_shape=8` runs the same step data-parallel over a
  `jax.sharding.Mesh` (Adam and L-BFGS, line searches included).
- **Import reference checkpoints**: `python -m lshm_tpu.cli import-torch --net
  net.model --net-t netT.model --net-f netF.model --khm khm.model --out ckpt/`.
"""),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true",
                    help="run the notebook via nbclient, storing outputs inline")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    if args.execute:
        from nbclient import NotebookClient

        client = NotebookClient(nb, timeout=1200, kernel_name="python3",
                                resources={"metadata": {"path": HERE}})
        client.execute()
    with open(args.out, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {args.out} ({len(nb.cells)} cells, executed={args.execute})")


if __name__ == "__main__":
    main()
