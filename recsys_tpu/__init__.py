"""recsys_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
wangruichens/recsys (reference mounted at /root/reference): the Criteo CTR
model zoo (FM, DeepFM, DCN, xDeepFM/CIN, DNN, wide/linear), sequence models
(DIN), collaborative filtering (Multi-VAE/Multi-DAE, CDAE), classical models
(FTRL-proximal LR, GBDT-leaf+LR), plus the full training runtime (sharded
embedding tables, streaming AUC, checkpointing, train/eval driver), data
pipeline (Criteo preprocessing + sharded loaders), and serving stack.

Where the reference delegates to TF1's C++ internals (feature_column hashing,
MirroredStrategy NCCL all-reduce, TFRecord readers), this package provides
TPU-native equivalents: a unified offset-packed embedding subsystem sharded
over a `jax.sharding.Mesh`, `pjit`-compiled train steps with XLA collectives
over ICI, Pallas kernels for the interaction ops, and a native C++ host-side
data plane.
"""

__version__ = "0.1.0"

from recsys_tpu.core.config import (  # noqa: F401
    CriteoConfig,
    EmbeddingConfig,
    MeshConfig,
    ModelConfig,
    RunConfig,
    TrainConfig,
)
from recsys_tpu.core.mesh import MeshEnv, make_mesh  # noqa: F401
