"""TPU-native attention-MIL framework for whole-slide histopathology.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``frankenz/Deep-convolutional-neural-network-ResNet-26-and-Attention-network``
(see SURVEY.md): whole-slide-image tiling with tissue filtering and caching,
a no-norm ResNet-26 per-tile feature extractor, a gated attention
multiple-instance-learning head classifying each slide as recurrent glioma /
treatment effect / infiltrated brain, attention-weight heatmap export, staged
training with checkpointing, and the surrounding metrics/plot tooling.

Design stance (TPU-first, not a port):
  * functional models with explicit parameter pytrees (no module objects in
    the compute path) so everything jits and shards cleanly,
  * NHWC layouts, bf16 matmul/conv compute with fp32 params + accumulation,
  * bags of tiles are padded to static bucket sizes with a validity mask
    threaded exactly through every normalization (the reference never needed
    masks because it ran one ragged bag at a time on GPU),
  * multi-chip scaling via ``jax.sharding.Mesh`` + GSPMD shardings over a
    (slides, tiles) mesh — XLA inserts the psums that replace the reference's
    ``nn.DataParallel`` scatter/gather (reference: gbm/model.py:132-135).

The package is importable under the short alias ``gbmnet`` (see gbmnet.py at
the repo root).
"""

from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import parallel  # noqa: F401

__version__ = "0.1.0"
