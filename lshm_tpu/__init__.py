"""LSHM-TPU: a TPU-native JAX framework for self-supervised LOFAR system-health monitoring.

A ground-up rebuild of the capabilities of the PyTorch reference (SarodYatawatta/LSHM),
designed for TPU hardware: Flax models, fused/vectorized losses, a jittable stochastic
L-BFGS with on-device line search, pjit/shard_map data parallelism over device meshes,
and Pallas kernels for the clustering-loss hot path.

Subpackages
-----------
- ``lshm_tpu.config``  — dataclass configuration (replaces reference module-constant configs)
- ``lshm_tpu.data``    — LOFAR H5 ingestion, synthetic fixtures, patch pipeline
- ``lshm_tpu.models``  — Flax autoencoders + K-harmonic-means clustering head
- ``lshm_tpu.losses``  — fused pure-function losses (KHM, similarity, augmentation, RICA, ADMM)
- ``lshm_tpu.optim``   — jittable L-BFGS with backtracking/cubic line search
- ``lshm_tpu.train``   — train states, ADMM train steps, alternating schedules, sharding
- ``lshm_tpu.eval``    — clustering evaluation (distance matrices, t-SNE, montages)
- ``lshm_tpu.graph``   — station/baseline graph builders + segment-sum GNNs
- ``lshm_tpu.kernels`` — Pallas TPU kernels
- ``lshm_tpu.utils``   — checkpointing, metrics, RGB rendering, torch-checkpoint import
"""

__version__ = "0.1.0"
